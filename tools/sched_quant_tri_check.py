#!/usr/bin/env python3
"""Validate the batch_schedule, exact_quantiles, and host_triangles oracle SQL
against independent Python recomputes (CLAUDE.md rule).
Usage: sched_quant_tri_check.py [sfDir]."""
import sys
from collections import Counter, defaultdict

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

SCHED = """
WITH all_d AS (SELECT doc_id, text FROM documents
               UNION ALL SELECT doc_id + 1000000, text FROM documents),
h AS (SELECT doc_id, text, list_reduce(list_prepend(14695981039346656037::HUGEINT,
        [unicode(c)::HUGEINT for c in string_split('batch:' || doc_id, '')]),
        (h,b) -> ((h - h%128 + xor((h%128)::BIGINT, b::BIGINT)::HUGEINT) * 1099511628211::HUGEINT) % (1::HUGEINT<<64)) AS hv
      FROM all_d),
w AS (SELECT doc_id, (hv % 4)::BIGINT AS shard,
             row_number() OVER (PARTITION BY text ORDER BY doc_id) AS wave FROM h)
SELECT doc_id, CAST(wave AS BIGINT) AS wave, shard,
       CAST((wave-1)*4 + shard AS BIGINT) AS batch
FROM w ORDER BY doc_id
"""

QUANT = """
WITH v AS (SELECT length(text)::BIGINT AS v, count(*)::BIGINT AS n FROM documents GROUP BY 1),
c AS (SELECT v, sum(n) OVER (ORDER BY v) AS cumn FROM v),
t AS (SELECT sum(n)::BIGINT AS total FROM v),
q AS (SELECT unnest([2500,5000,7500,9000,9900])::BIGINT AS q_bp),
r AS (SELECT q_bp, (q_bp*total + 9999)//10000 AS rnk FROM q, t)
SELECT q_bp, CAST(rnk AS BIGINT) AS rnk, CAST(min(c.v) AS BIGINT) AS value
FROM r JOIN c ON c.cumn >= r.rnk GROUP BY 1, 2 ORDER BY q_bp
"""

TRI = """
WITH e0 AS (
  SELECT 'site' || (doc_id%7) || '.example.com' AS src,
         'site' || ((2*doc_id+1)%7) || '.example.com' AS dst FROM documents
  UNION ALL
  SELECT 'site' || (doc_id%7) || '.example.com' AS src,
         'site' || ((3*doc_id+2)%7) || '.example.com' AS dst FROM documents WHERE doc_id%3=0
  UNION ALL
  SELECT 'site' || (doc_id%7) || '.example.com' AS src,
         'site0.example.com' AS dst FROM documents WHERE doc_id%5<2),
und AS (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM e0 WHERE src <> dst),
deg AS (SELECT host, count(*)::BIGINT AS deg
        FROM (SELECT a AS host FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1 JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
ph AS (SELECT host, count(*)::BIGINT AS tri
       FROM (SELECT unnest([x,y,z]) AS host FROM tri) GROUP BY 1)
SELECT deg.host, deg.deg, coalesce(ph.tri, 0)::BIGINT AS tri,
       CAST(CASE WHEN deg.deg < 2 THEN 0
            ELSE (coalesce(ph.tri,0)*20000)//(deg.deg*(deg.deg-1)) END AS BIGINT) AS cc_bp
FROM deg LEFT JOIN ph USING (host) ORDER BY host
"""


def fnv(s):
    h = 0xcbf29ce484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001b3) % (1 << 64)
    return h


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    rows = dict(con.execute("SELECT doc_id, text FROM documents").fetchall())

    # --- batch_schedule ---
    got = [tuple(int(x) for x in r) for r in con.execute(SCHED).fetchall()]
    alld = [(i, t) for i, t in rows.items()] + [(i + 1000000, t) for i, t in rows.items()]
    bytext = defaultdict(list)
    for i, t in alld:
        bytext[t].append(i)
    want = []
    for t, ids in bytext.items():
        for w, i in enumerate(sorted(ids), 1):
            sh = fnv(f"batch:{i}") % 4
            want.append((i, w, sh, (w - 1) * 4 + sh))
    want.sort()
    assert got == want, f"SCHED mismatch: {[x for x in got if x not in set(want)][:3]}"
    # structural validity: no two same-text docs share a batch
    for t, ids in bytext.items():
        batches = [next(r[3] for r in want if r[0] == i) for i in ids]
        assert len(set(batches)) == len(batches), f"batch collision for text group {ids}"
    print(f"batch_schedule oracle OK: {len(want)} rows; no same-text batch collisions")

    # --- exact_quantiles ---
    got = [tuple(int(x) for x in r) for r in con.execute(QUANT).fetchall()]
    lens = sorted(len(t) for t in rows.values())
    n = len(lens)
    want = []
    for q in [2500, 5000, 7500, 9000, 9900]:
        rnk = (q * n + 9999) // 10000
        want.append((q, rnk, lens[rnk - 1]))
    assert got == want, f"QUANT mismatch: got={got} want={want}"
    print(f"exact_quantiles oracle OK: {got}")

    # --- host_triangles ---
    got = [(r[0], int(r[1]), int(r[2]), int(r[3])) for r in con.execute(TRI).fetchall()]
    und = set()
    for i in rows:
        for s, d in [(i % 7, (2 * i + 1) % 7)] + \
                    ([(i % 7, (3 * i + 2) % 7)] if i % 3 == 0 else []) + \
                    ([(i % 7, 0)] if i % 5 < 2 else []):
            if s != d:
                und.add((min(s, d), max(s, d)))
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    tric = Counter()
    nodes = sorted(adj)
    for a in nodes:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    tric[a] += 1
                    tric[b] += 1
                    tric[c] += 1
    want = []
    for h in nodes:
        d = len(adj[h])
        t = tric[h]
        cc = 0 if d < 2 else (t * 20000) // (d * (d - 1))
        want.append((f"site{h}.example.com", d, t, cc))
    assert got == want, f"TRI mismatch: got={got} want={want}"
    print(f"host_triangles oracle OK: {got}")


if __name__ == "__main__":
    main()
