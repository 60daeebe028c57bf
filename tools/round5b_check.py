#!/usr/bin/env python3
"""Validate the kcore_hosts, cocitation_hosts, epoch_schedule, and
split_leakproof oracle SQL against independent Python recomputes
(CLAUDE.md rule). Usage: round5b_check.py [sfDir]."""
import sys
from collections import defaultdict

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

E0 = """
e0 AS (
  SELECT 'site' || (doc_id%7) || '.example.com' AS src,
         'site' || ((2*doc_id+1)%7) || '.example.com' AS dst FROM documents
  UNION ALL
  SELECT 'site' || (doc_id%7) || '.example.com' AS src,
         'site' || ((3*doc_id+2)%7) || '.example.com' AS dst FROM documents WHERE doc_id%3=0
  UNION ALL
  SELECT 'site' || (doc_id%7) || '.example.com' AS src,
         'site0.example.com' AS dst FROM documents WHERE doc_id%5<2)
"""

# k-core (k=3): unrolled peel rounds over the undirected host graph. A round
# past the fixed point is a no-op, so the fixed 8-round unroll is exact for
# any graph with <= 8 effective peel rounds (the mod-7 host graph peels in
# <= 7; asserted by the checker).
def kcore_sql():
    ctes = [E0.strip(),
            "und AS MATERIALIZED (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM e0 WHERE src <> dst)",
            "n0 AS MATERIALIZED (SELECT a AS host FROM und UNION SELECT b FROM und)"]
    prev = "n0"
    for r in range(1, 9):
        ctes.append(
            f"e{r} AS MATERIALIZED (SELECT a, b FROM und WHERE a IN (SELECT host FROM {prev}) AND b IN (SELECT host FROM {prev}))")
        ctes.append(
            f"n{r} AS MATERIALIZED (SELECT host FROM (SELECT a AS host FROM e{r} UNION ALL SELECT b FROM e{r}) GROUP BY 1 HAVING count(*) >= 3)")
        prev = f"n{r}"
    return ("WITH " + ",\n".join(ctes) + f""",
core_e AS (SELECT a, b FROM und WHERE a IN (SELECT host FROM {prev}) AND b IN (SELECT host FROM {prev})),
core_d AS (SELECT host, count(*)::BIGINT AS core_deg
           FROM (SELECT a AS host FROM core_e UNION ALL SELECT b FROM core_e) GROUP BY 1)
SELECT n0.host,
       CAST(CASE WHEN core_d.host IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_core,
       coalesce(core_d.core_deg, 0)::BIGINT AS core_deg
FROM n0 LEFT JOIN core_d ON n0.host = core_d.host ORDER BY n0.host""")


COCITE = "WITH " + E0.strip() + """,
e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
ind AS (SELECT dst, count(*)::BIGINT AS indeg FROM e GROUP BY 1),
p AS (SELECT e1.dst AS h1, e2.dst AS h2, count(*)::BIGINT AS cocite
      FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst GROUP BY 1, 2)
SELECT h1, h2, cocite,
       CAST((cocite*10000)//(i1.indeg + i2.indeg - cocite) AS BIGINT) AS jac_bp
FROM p JOIN ind i1 ON p.h1 = i1.dst JOIN ind i2 ON p.h2 = i2.dst
ORDER BY h1, h2"""

# variable-multiplicity plant: doc gains a copy at +r*1000000 for each
# r in 1..3 with doc_id%4 >= r  ->  group sizes 1..4 by doc_id%4
EPOCH = """
WITH all_d AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id%4 >= 1
  UNION ALL SELECT doc_id + 2000000, text FROM documents WHERE doc_id%4 >= 2
  UNION ALL SELECT doc_id + 3000000, text FROM documents WHERE doc_id%4 >= 3),
g AS (SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS dup_count FROM all_d GROUP BY text)
SELECT doc_id, dup_count,
       CAST(greatest(1, 4//dup_count) AS BIGINT) AS epochs,
       CAST(dup_count * greatest(1, 4//dup_count) AS BIGINT) AS naive_passes
FROM g ORDER BY doc_id"""

SPLIT = """
WITH all_d AS (SELECT doc_id, text FROM documents
               UNION ALL SELECT doc_id + 1000000, text FROM documents),
h AS (SELECT doc_id, text, list_reduce(list_prepend(14695981039346656037::HUGEINT,
        [unicode(c)::HUGEINT for c in string_split('split:' || doc_id, '')]),
        (h,b) -> ((h - h%128 + xor((h%128)::BIGINT, b::BIGINT)::HUGEINT) * 1099511628211::HUGEINT) % (1::HUGEINT<<64)) AS hv
      FROM all_d),
r AS (SELECT doc_id, text,
             CASE WHEN (hv % 100) < 10 THEN 1 ELSE 0 END AS raw_split FROM h),
f AS (SELECT doc_id, raw_split,
             min(raw_split) OVER (PARTITION BY text) AS split FROM r)
SELECT doc_id, CAST(raw_split AS BIGINT) AS raw_split, CAST(split AS BIGINT) AS split,
       CAST(CASE WHEN raw_split <> split THEN 1 ELSE 0 END AS BIGINT) AS moved
FROM f ORDER BY doc_id"""


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

    # shared graph recompute
    und = set()
    for i in rows:
        for s, d in [(i % 7, (2 * i + 1) % 7)] + \
                    ([(i % 7, (3 * i + 2) % 7)] if i % 3 == 0 else []) + \
                    ([(i % 7, 0)] if i % 5 < 2 else []):
            if s != d:
                und.add((min(s, d), max(s, d)))

    # --- kcore_hosts ---
    got = [(r[0], int(r[1]), int(r[2])) for r in con.execute(kcore_sql()).fetchall()]
    nodes = set()
    for a, b in und:
        nodes |= {a, b}
    cur = set(nodes)
    rounds = 0
    while True:
        deg = defaultdict(int)
        for a, b in und:
            if a in cur and b in cur:
                deg[a] += 1
                deg[b] += 1
        nxt = {h for h in cur if deg[h] >= 3}
        rounds += 1
        if nxt == cur:
            break
        cur = nxt
    assert rounds <= 8, f"peel needs {rounds} rounds > unrolled 8"
    cdeg = defaultdict(int)
    for a, b in und:
        if a in cur and b in cur:
            cdeg[a] += 1
            cdeg[b] += 1
    want = sorted((f"site{h}.example.com", 1 if h in cur else 0,
                   cdeg[h] if h in cur else 0) for h in nodes)
    assert got == want, f"KCORE mismatch: got={got} want={want}"
    print(f"kcore_hosts oracle OK ({rounds} peel rounds): {got}")

    # --- cocitation_hosts ---
    got = [(r[0], r[1], int(r[2]), int(r[3])) for r in con.execute(COCITE).fetchall()]
    dire = set()
    for i in rows:
        for s, d in [(i % 7, (2 * i + 1) % 7)] + \
                    ([(i % 7, (3 * i + 2) % 7)] if i % 3 == 0 else []) + \
                    ([(i % 7, 0)] if i % 5 < 2 else []):
            if s != d:
                dire.add((f"site{s}.example.com", f"site{d}.example.com"))
    citers = defaultdict(set)
    for s, d in dire:
        citers[d].add(s)
    want = []
    hs = sorted(citers)
    for i1, h1 in enumerate(hs):
        for h2 in hs[i1 + 1:]:
            co = len(citers[h1] & citers[h2])
            if co:
                want.append((h1, h2, co,
                             co * 10000 // (len(citers[h1]) + len(citers[h2]) - co)))
    want.sort()
    assert got == want, f"COCITE mismatch: got={got} want={want}"
    print(f"cocitation_hosts oracle OK: {len(got)} pairs")

    # --- epoch_schedule ---
    got = [tuple(int(x) for x in r) for r in con.execute(EPOCH).fetchall()]
    alld = [(i, t) for i, t in rows.items()]
    for r in (1, 2, 3):
        alld += [(i + r * 1000000, t) for i, t in rows.items() if i % 4 >= r]
    bytext = defaultdict(list)
    for i, t in alld:
        bytext[t].append(i)
    want = sorted((min(ids), len(ids), max(1, 4 // len(ids)),
                   len(ids) * max(1, 4 // len(ids))) for ids in bytext.values())
    assert got == want, f"EPOCH mismatch: {[x for x in got if x not in set(want)][:3]}"
    # group sizes follow doc_id%4 + 1 (texts are unique per doc in testdata)
    for ids in bytext.values():
        assert len(ids) == min(ids) % 4 + 1
    print(f"epoch_schedule oracle OK: {len(got)} groups")

    # --- split_leakproof ---
    got = [tuple(int(x) for x in r) for r in con.execute(SPLIT).fetchall()]
    alld = [(i, t) for i, t in rows.items()] + \
           [(i + 1000000, t) for i, t in rows.items()]
    raw = {i: (1 if fnv(f"split:{i}") % 100 < 10 else 0) for i, _ in alld}
    grp = defaultdict(list)
    for i, t in alld:
        grp[t].append(i)
    fin = {}
    for ids in grp.values():
        m = min(raw[i] for i in ids)
        for i in ids:
            fin[i] = m
    want = sorted((i, raw[i], fin[i], 1 if raw[i] != fin[i] else 0) for i in raw)
    assert got == want, f"SPLIT mismatch: {[x for x in got if x not in set(want)][:3]}"
    moved = sum(1 for r in want if r[3])
    test = sum(1 for r in want if r[2])
    assert moved > 0, "plant produced no leakage moves — test is vacuous"
    assert 0 < test < len(want), "degenerate split"
    print(f"split_leakproof oracle OK: {len(got)} rows, {moved} moved, {test} test docs")


if __name__ == "__main__":
    main()
