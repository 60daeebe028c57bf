"""Pre-wiring validation for the pack_greedy oracle (CLAUDE.md rule):
recompute the block-scoped greedy no-split bin packing in plain Python and
diff against the DuckDB recursive-CTE oracle, at both test sfs.

Usage: python3 tools/packgreedy_oracle_check.py [sf_dir ...]
"""
import sys

import duckdb

BUDGET = 96
BLOCK = 256

ORACLE = """
WITH RECURSIVE t AS (
  SELECT doc_id, doc_id // 256 AS block,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
         row_number() OVER (PARTITION BY doc_id // 256 ORDER BY doc_id) AS rn
  FROM '{sf}/documents.parquet'),
r AS (
  SELECT doc_id, block, n, rn, CAST(0 AS BIGINT) AS bin,
         CAST(0 AS BIGINT) AS off, n AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.doc_id, t.block, t.n, t.rn,
         CASE WHEN r.fill + t.n > 96 THEN r.bin + 1 ELSE r.bin END,
         CASE WHEN r.fill + t.n > 96 THEN CAST(0 AS BIGINT) ELSE r.fill END,
         CASE WHEN r.fill + t.n > 96 THEN t.n ELSE r.fill + t.n END
  FROM r JOIN t ON t.block = r.block AND t.rn = r.rn + 1)
SELECT doc_id, n AS n_tokens, block, block * 256 + bin AS bin_id, off AS bin_off
FROM r ORDER BY doc_id
"""


def python_recompute(sf, con):
    rows = con.sql(f"SELECT doc_id, text FROM '{sf}/documents.parquet' "
                   "ORDER BY doc_id").fetchall()
    out = []
    cur_block, binno, fill = None, -1, 0
    for doc_id, text in rows:
        n = len(text.split(" "))
        block = doc_id // BLOCK
        if block != cur_block:
            cur_block, binno, fill = block, -1, 0
        if binno < 0 or fill + n > BUDGET:
            binno += 1
            fill = 0
        out.append((doc_id, n, block, block * BLOCK + binno, fill))
        fill += n
    return out


def main():
    sfs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    con = duckdb.connect()
    ok = True
    for sf in sfs:
        py = python_recompute(sf, con)
        db = [tuple(r) for r in con.sql(ORACLE.format(sf=sf)).fetchall()]
        match = py == db
        ok &= match
        bins = len({r[3] for r in py})
        solo = sum(1 for r in py if r[1] > BUDGET)
        print(f"{sf}: rows={len(py)} bins={bins} oversize_docs={solo} -> "
              f"{'OK' if match else 'MISMATCH'}")
        if not match:
            for p, d in zip(py, db):
                if p != d:
                    print("  first diff:", p, "vs", d)
                    break
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
