#!/usr/bin/env python3
"""Validate the hits_scores oracle SQL against an independent Python recompute
(CLAUDE.md rule). Usage: hits_check.py [sfDir]."""
import sys
from collections import defaultdict

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
SCALE = 1000000


def hits_ctes(rounds):
    head = """WITH e0 AS MATERIALIZED (
  SELECT 'site' || (doc_id%7) || '.example.com' AS src,
         'site' || ((2*doc_id+1)%7) || '.example.com' AS dst FROM documents
  UNION ALL
  SELECT 'site' || (doc_id%7) || '.example.com' AS src,
         'site' || ((3*doc_id+2)%7) || '.example.com' AS dst FROM documents WHERE doc_id%3=0
  UNION ALL
  SELECT 'site' || (doc_id%7) || '.example.com' AS src,
         'site0.example.com' AS dst FROM documents WHERE doc_id%5<2),
e AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS weight FROM e0 GROUP BY src, dst),
nodes AS MATERIALIZED (SELECT src AS host FROM e UNION SELECT dst FROM e),
h0 AS MATERIALIZED (SELECT host, 1000000 AS hub FROM nodes)"""
    its = []
    for k in range(1, rounds + 1):
        its.append(f"""a{k}r AS MATERIALIZED (SELECT e.dst AS host, sum(h{k-1}.hub * e.weight) AS raw
  FROM e JOIN h{k-1} ON h{k-1}.host = e.src GROUP BY e.dst),
a{k} AS MATERIALIZED (SELECT n.host, coalesce((a{k}r.raw * 1000000) // (SELECT max(raw) FROM a{k}r), 0) AS auth
  FROM nodes n LEFT JOIN a{k}r USING (host)),
h{k}r AS MATERIALIZED (SELECT e.src AS host, sum(a{k}.auth * e.weight) AS raw
  FROM e JOIN a{k} ON a{k}.host = e.dst GROUP BY e.src),
h{k} AS MATERIALIZED (SELECT n.host, coalesce((h{k}r.raw * 1000000) // (SELECT max(raw) FROM h{k}r), 0) AS hub
  FROM nodes n LEFT JOIN h{k}r USING (host))""")
    return head + ",\n" + ",\n".join(its)


ORACLE = (hits_ctes(3) +
          "\nSELECT host, CAST(hub AS BIGINT) AS hub, CAST(auth AS BIGINT) AS auth"
          "\nFROM h3 JOIN a3 USING (host) ORDER BY host")


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    got = [(r[0], int(r[1]), int(r[2])) for r in con.execute(ORACLE).fetchall()]

    ids = [r[0] for r in con.execute("SELECT doc_id FROM documents").fetchall()]
    ew = defaultdict(int)
    for i in ids:
        ew[(f"site{i%7}.example.com", f"site{(2*i+1)%7}.example.com")] += 1
        if i % 3 == 0:
            ew[(f"site{i%7}.example.com", f"site{(3*i+2)%7}.example.com")] += 1
        if i % 5 < 2:
            ew[(f"site{i%7}.example.com", "site0.example.com")] += 1
    nodes = sorted({s for s, _ in ew} | {d for _, d in ew})
    hub = {n: SCALE for n in nodes}
    auth = {}
    for _ in range(3):
        raw = defaultdict(int)
        for (s, d), w in ew.items():
            raw[d] += hub[s] * w
        mx = max(raw.values())
        auth = {n: (raw.get(n, 0) * SCALE) // mx if n in raw else 0 for n in nodes}
        raw = defaultdict(int)
        for (s, d), w in ew.items():
            raw[s] += auth[d] * w
        mx = max(raw.values())
        hub = {n: (raw.get(n, 0) * SCALE) // mx if n in raw else 0 for n in nodes}
    want = [(n, hub[n], auth[n]) for n in nodes]

    if got == want:
        print(f"hits oracle OK: {len(want)}/{len(want)} hosts match the Python recompute")
    else:
        print(f"MISMATCH: got={got} want={want}")
        sys.exit(1)


if __name__ == "__main__":
    main()
