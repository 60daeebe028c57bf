#!/usr/bin/env python3
"""Validate the range_join, ppr_hosts, and budget_alloc oracle SQL against
independent Python recomputes (CLAUDE.md rule).
Usage: round5e_check.py [sfDir]."""
import sys
from collections import defaultdict

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

RANGE = """
WITH ev AS (SELECT event_id, event_type, floor(epoch(ts))::BIGINT AS sec FROM events),
iv AS (SELECT event_id AS iv_id, sec AS lo, sec + 5400 AS hi FROM ev WHERE event_id % 97 = 0),
pt AS (SELECT event_id, sec FROM ev WHERE event_type = 'error')
SELECT iv_id, pt.event_id, sec FROM iv JOIN pt ON sec BETWEEN lo AND hi
ORDER BY iv_id, pt.event_id
"""

BUDGET = """
WITH h AS (SELECT 'site' || (doc_id%7) || '.example.com' AS host,
                  count(*)::BIGINT AS n_docs FROM documents GROUP BY 1),
t AS (SELECT sum(n_docs)::BIGINT AS total FROM h),
b AS (SELECT host, n_docs, (997*n_docs)//total AS base, (997*n_docs)%total AS rem FROM h, t),
s AS (SELECT sum(base)::BIGINT AS sb FROM b),
r AS (SELECT host, n_docs, base,
             row_number() OVER (ORDER BY rem DESC, host) AS rk FROM b)
SELECT host, n_docs,
       CAST(base + CASE WHEN rk <= 997 - (SELECT sb FROM s) THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM r ORDER BY host
"""


# personalized PageRank: hostRankCtes with all teleport mass at the seed
def ppr_sql(rounds):
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
ow AS MATERIALIZED (SELECT src, sum(weight) AS outw FROM e GROUP BY src),
nodes AS MATERIALIZED (SELECT src AS host FROM e UNION SELECT dst FROM e),
r0 AS MATERIALIZED (SELECT host, CASE WHEN host = 'site0.example.com' THEN 1000000 ELSE 0 END AS rank FROM nodes)"""
    iters = []
    for k in range(1, rounds + 1):
        iters.append(f"""r{k} AS MATERIALIZED (SELECT n.host,
       (CASE WHEN n.host = 'site0.example.com' THEN (10000-8500)*1000000//10000 ELSE 0 END)
       + coalesce(s.c, 0) AS rank
       FROM nodes n LEFT JOIN (
         SELECT e.dst AS host, sum((r{k - 1}.rank * e.weight * 8500) // (ow.outw * 10000)) AS c
         FROM e JOIN ow USING (src) JOIN r{k - 1} ON r{k - 1}.host = e.src GROUP BY e.dst) s USING (host))""")
    return (",\n".join([head] + iters)
            + f"\nSELECT host, CAST(rank AS BIGINT) AS rank FROM r{rounds} ORDER BY host")


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    rows = dict(con.execute("SELECT doc_id, text FROM documents").fetchall())

    # --- range_join ---
    got = [tuple(int(x) for x in r) for r in con.execute(RANGE).fetchall()]
    evs = con.execute(
        "SELECT event_id, event_type, floor(epoch(ts))::BIGINT FROM events").fetchall()
    ivs = [(e, int(s), int(s) + 5400) for e, t, s in evs if e % 97 == 0]
    pts = [(e, int(s)) for e, t, s in evs if t == "error"]
    want = sorted((i, e, s) for i, lo, hi in ivs for e, s in pts if lo <= s <= hi)
    assert got == want, f"RANGE mismatch: {[x for x in got if x not in set(want)][:3]}"
    assert len(want) > 0, "range join produced no pairs — vacuous"
    # bucket-meet property the engine relies on: every matched point's single
    # B=1800 bucket lies within the interval's bucket span
    B = 1800
    for i, lo, hi in ivs:
        for e, s in pts:
            if lo <= s <= hi:
                assert lo // B <= s // B <= hi // B
    print(f"range_join oracle OK: {len(want)} pairs from {len(ivs)} intervals")

    # --- budget_alloc ---
    got = [(r[0], int(r[1]), int(r[2])) for r in con.execute(BUDGET).fetchall()]
    cnt = defaultdict(int)
    for i in rows:
        cnt[f"site{i % 7}.example.com"] += 1
    total = sum(cnt.values())
    base = {h: 997 * c // total for h, c in cnt.items()}
    rem = {h: 997 * cnt[h] % total for h in cnt}
    r = 997 - sum(base.values())
    winners = set(sorted(cnt, key=lambda h: (-rem[h], h))[:r])
    want = sorted((h, cnt[h], base[h] + (1 if h in winners else 0)) for h in cnt)
    assert got == want, f"BUDGET mismatch: got={got} want={want}"
    assert sum(a for _, _, a in want) == 997, "allocation must hit the budget exactly"
    assert r > 0, "no remainder slots — largest-remainder path unexercised"
    print(f"budget_alloc oracle OK: {want}")

    # --- ppr_hosts ---
    got = [(r[0], int(r[1])) for r in con.execute(ppr_sql(3)).fetchall()]
    edges = defaultdict(int)
    for i in rows:
        s = f"site{i % 7}.example.com"
        edges[(s, f"site{(2 * i + 1) % 7}.example.com")] += 1
        if i % 3 == 0:
            edges[(s, f"site{(3 * i + 2) % 7}.example.com")] += 1
        if i % 5 < 2:
            edges[(s, "site0.example.com")] += 1
    outw = defaultdict(int)
    for (s, d), w in edges.items():
        outw[s] += w
    hosts = sorted({x for e in edges for x in e})
    seed = "site0.example.com"
    rank = {h: (1000000 if h == seed else 0) for h in hosts}
    for _ in range(3):
        c = defaultdict(int)
        for (s, d), w in edges.items():
            c[d] += (rank[s] * w * 8500) // (outw[s] * 10000)
        rank = {h: ((10000 - 8500) * 1000000 // 10000 if h == seed else 0) + c[h]
                for h in hosts}
    want = sorted((h, rank[h]) for h in hosts)
    assert got == want, f"PPR mismatch: got={got} want={want}"
    assert want != sorted((h, 0) for h in hosts)
    # personalization check: the seed's neighborhood outranks the periphery
    print(f"ppr_hosts oracle OK: {want}")


if __name__ == "__main__":
    main()
