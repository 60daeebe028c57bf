"""Pre-wiring validation for the heavy_hitters oracle (CLAUDE.md rule):
recompute the exact heavy-hitter table in plain Python over the planted
bigram stream and diff it against the DuckDB oracle SQL, at both test sfs.

Usage: python3 tools/hh_oracle_check.py [sf_dir ...]
"""
import sys
from collections import Counter

import duckdb

BOILER = "boiler plate nav menu spam footer links here"

ORACLE = """
WITH p AS (SELECT 'boiler plate nav menu spam footer links here ' || text AS text FROM '{sf}/documents.parquet'),
w AS (SELECT string_split(text, ' ') AS ws FROM p),
b AS (SELECT ws[i] || ' ' || ws[i+1] AS term
      FROM w, UNNEST(generate_series(1, len(ws)-1)) t(i)),
tc AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY term),
n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM tc)
SELECT term, cnt, CAST(cnt * 10000 // (SELECT n FROM n) AS BIGINT) AS share_bp
FROM tc WHERE cnt * 200 >= (SELECT n FROM n)
ORDER BY cnt DESC, term
"""


def python_recompute(sf):
    con = duckdb.connect()
    texts = [r[0] for r in con.sql(
        f"SELECT text FROM '{sf}/documents.parquet'").fetchall()]
    counts = Counter()
    for t in texts:
        ws = (BOILER + " " + t).split(" ")
        for i in range(len(ws) - 1):
            counts[ws[i] + " " + ws[i + 1]] += 1
    n = sum(counts.values())
    out = [(term, c, c * 10000 // n) for term, c in counts.items()
           if c * 200 >= n]
    out.sort(key=lambda r: (-r[1], r[0]))
    return out, n


def main():
    sfs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    ok = True
    for sf in sfs:
        py, n = python_recompute(sf)
        con = duckdb.connect()
        db = con.sql(ORACLE.format(sf=sf)).fetchall()
        db = [(r[0], r[1], r[2]) for r in db]
        match = py == db
        ok &= match
        boiler_bigrams = [" ".join(p) for p in zip(BOILER.split(), BOILER.split()[1:])]
        planted_in = sum(1 for t, _, _ in py if t in boiler_bigrams)
        print(f"{sf}: rows python={len(py)} duckdb={len(db)} N={n} "
              f"planted {planted_in}/{len(boiler_bigrams)} -> "
              f"{'OK' if match else 'MISMATCH'}")
        if not match:
            sp, sd = set(py), set(db)
            print("  only-python:", sorted(sp - sd)[:5])
            print("  only-duckdb:", sorted(sd - sp)[:5])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
