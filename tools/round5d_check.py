#!/usr/bin/env python3
"""Validate the fuzzy_join, funnel_counts, and hyperball_reach oracle SQL
against independent Python recomputes (CLAUDE.md rule).
Usage: round5d_check.py [sfDir]."""
import sys
from collections import defaultdict

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# Blocked record linkage: block on the title's first 8 chars, verify with
# levenshtein <= 3. Catalog B perturbs every doc: %5==0 reversed (unmatchable
# by design), else a 3-char ' v<n>' suffix (lev exactly 3).
FUZZY = """
WITH a AS (SELECT doc_id AS a_id, substring(text, 1, 40) AS title_a FROM documents),
b AS (SELECT doc_id + 1000000 AS b_id,
             CASE WHEN doc_id%5=0 THEN reverse(substring(text, 1, 40))
                  ELSE substring(text, 1, 40) || ' v' || (doc_id%3) END AS title_b
      FROM documents),
c AS (SELECT a_id, b_id, title_a, title_b FROM a JOIN b
      ON substring(title_a, 1, 8) = substring(title_b, 1, 8)),
m AS (SELECT a_id, b_id, CAST(levenshtein(title_a, title_b) AS BIGINT) AS lev FROM c)
SELECT a_id, b_id, lev FROM m WHERE lev <= 3 ORDER BY a_id, b_id
"""

# Ordered funnel view -> click -> purchase per user; step 2 = first click
# AFTER any view AND within W=14400 s of it; step 3 = first purchase after
# that click within W. Order key k = sec * 10000000 + event_id (sec from
# floor(epoch); ids < 10^7 at the test sfs, contract documented engine-side).
FUNNEL = """
WITH ev AS (SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS sec,
                   floor(epoch(ts))::BIGINT * 10000000 + event_id AS k
            FROM events),
v AS (SELECT user_id, min(k) AS vk FROM ev WHERE event_type = 'view' GROUP BY 1),
cand AS (SELECT c.user_id, c.k FROM ev c JOIN ev vv
         ON c.user_id = vv.user_id AND vv.event_type = 'view'
        WHERE c.event_type = 'click' AND vv.k < c.k AND c.sec - vv.sec <= 14400),
cs AS (SELECT user_id, min(k) AS ck FROM cand GROUP BY 1),
p AS (SELECT ev.user_id, min(k) AS pk FROM ev JOIN cs USING (user_id)
      WHERE event_type = 'purchase' AND k > ck AND sec - ck // 10000000 <= 14400
      GROUP BY 1)
SELECT v.user_id,
       CAST(1 + (ck IS NOT NULL)::INT + (pk IS NOT NULL)::INT AS BIGINT) AS reached,
       CAST(vk // 10000000 AS BIGINT) AS view_sec,
       CAST(coalesce(ck // 10000000, -1) AS BIGINT) AS click_sec,
       CAST(coalesce(pk // 10000000, -1) AS BIGINT) AS purchase_sec
FROM v LEFT JOIN cs ON v.user_id = cs.user_id LEFT JOIN p ON v.user_id = p.user_id
ORDER BY v.user_id
"""

SPLITMIX = """
h1 AS (SELECT host, (v + 11400714819323198485) % 18446744073709551616 AS z FROM f),
h2 AS (SELECT host, xor(z, z >> 30) AS x FROM h1),
h3 AS (SELECT host,
         ((x % 4294967296) * 484763065
          + (((x % 4294967296) * 3210233709 + (x // 4294967296) * 484763065) % 4294967296) * 4294967296)
         % 18446744073709551616 AS z
       FROM h2),
h4 AS (SELECT host, xor(z, z >> 27) AS x FROM h3),
h5 AS (SELECT host,
         ((x % 4294967296) * 321982955
          + (((x % 4294967296) * 2496678331 + (x // 4294967296) * 321982955) % 4294967296) * 4294967296)
         % 18446744073709551616 AS z
       FROM h4),
hh AS (SELECT host, xor(z, z >> 31) AS h FROM h5)
"""

HYPERBALL = f"""
WITH e0 AS (
  SELECT 'site' || (doc_id%7) || '.example.com' AS src,
         'site' || ((2*doc_id+1)%7) || '.example.com' AS dst FROM documents
  UNION ALL
  SELECT 'site' || (doc_id%7) || '.example.com' AS src,
         'site' || ((3*doc_id+2)%7) || '.example.com' AS dst FROM documents WHERE doc_id%3=0
  UNION ALL
  SELECT 'site' || (doc_id%7) || '.example.com' AS src,
         'site0.example.com' AS dst FROM documents WHERE doc_id%5<2),
und AS MATERIALIZED (SELECT DISTINCT least(src,dst) AS a, greatest(src,dst) AS b FROM e0 WHERE src <> dst),
hosts AS MATERIALIZED (SELECT a AS host FROM und UNION SELECT b FROM und),
adj AS MATERIALIZED (SELECT a AS u, b AS v FROM und UNION SELECT b, a FROM und
                     UNION SELECT host, host FROM hosts),
f AS (SELECT host, list_reduce(list_prepend(14695981039346656037::HUGEINT,
        [unicode(c)::HUGEINT for c in string_split(host, '')]),
        (h,b) -> ((h - h%128 + xor((h%128)::BIGINT, b::BIGINT)::HUGEINT) * 1099511628211::HUGEINT) % (1::HUGEINT<<64)) AS v
      FROM hosts),
{SPLITMIX.strip()},
s0 AS MATERIALIZED (SELECT host, CAST(h // 288230376151711744 AS BIGINT) AS idx,
        CAST(CASE WHEN h % 288230376151711744 = 0 THEN 59
                  ELSE 58 - len(bin(h % 288230376151711744)) + 1 END AS BIGINT) AS rho
      FROM hh),
s1 AS MATERIALIZED (SELECT adj.u AS host, idx, max(rho) AS rho FROM adj JOIN s0 ON s0.host = adj.v GROUP BY 1, 2),
s2 AS MATERIALIZED (SELECT adj.u AS host, idx, max(rho) AS rho FROM adj JOIN s1 ON s1.host = adj.v GROUP BY 1, 2),
s3 AS MATERIALIZED (SELECT adj.u AS host, idx, max(rho) AS rho FROM adj JOIN s2 ON s2.host = adj.v GROUP BY 1, 2),
p0 AS MATERIALIZED (SELECT host, host AS member FROM hosts),
p1 AS MATERIALIZED (SELECT DISTINCT adj.u AS host, p0.member FROM adj JOIN p0 ON p0.host = adj.v),
p2 AS MATERIALIZED (SELECT DISTINCT adj.u AS host, p1.member FROM adj JOIN p1 ON p1.host = adj.v),
p3 AS MATERIALIZED (SELECT DISTINCT adj.u AS host, p2.member FROM adj JOIN p2 ON p2.host = adj.v),
grid AS (SELECT hosts.host, g.i AS idx FROM hosts, UNNEST(generate_series(0, 63)) g(i)),
est AS (
  SELECT 1 AS r, grid.host, sum(CAST(1 AS HUGEINT) << (59 - coalesce(s1.rho, 0))) AS z2
  FROM grid LEFT JOIN s1 ON grid.host = s1.host AND grid.idx = s1.idx GROUP BY 1, 2
  UNION ALL
  SELECT 2, grid.host, sum(CAST(1 AS HUGEINT) << (59 - coalesce(s2.rho, 0)))
  FROM grid LEFT JOIN s2 ON grid.host = s2.host AND grid.idx = s2.idx GROUP BY 1, 2
  UNION ALL
  SELECT 3, grid.host, sum(CAST(1 AS HUGEINT) << (59 - coalesce(s3.rho, 0)))
  FROM grid LEFT JOIN s3 ON grid.host = s3.host AND grid.idx = s3.idx GROUP BY 1, 2),
ex AS (
  SELECT 1 AS r, host, count(*)::BIGINT AS ball_exact FROM p1 GROUP BY 1, 2
  UNION ALL SELECT 2, host, count(*)::BIGINT FROM p2 GROUP BY 1, 2
  UNION ALL SELECT 3, host, count(*)::BIGINT FROM p3 GROUP BY 1, 2)
SELECT est.host, CAST(est.r AS BIGINT) AS r,
       CAST((709343 * CAST(4096 AS HUGEINT) * 576460752303423488) // (1000000 * z2) AS BIGINT) AS ball_est,
       ex.ball_exact
FROM est JOIN ex ON est.host = ex.host AND est.r = ex.r
ORDER BY est.host, est.r
"""


def fnv(s):
    h = 0xcbf29ce484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001b3) % (1 << 64)
    return h


def splitmix64(x):
    M = (1 << 64) - 1
    z = (x + 0x9E3779B97F4A7C15) & M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    return z ^ (z >> 31)


def lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    rows = dict(con.execute("SELECT doc_id, text FROM documents").fetchall())

    # --- fuzzy_join ---
    got = [(int(r[0]), int(r[1]), int(r[2])) for r in con.execute(FUZZY).fetchall()]
    a = {i: t[:40] for i, t in rows.items()}
    b = {i + 1000000: (t[:40][::-1] if i % 5 == 0 else t[:40] + f" v{i % 3}")
         for i, t in rows.items()}
    want = sorted((ai, bi, lev(ta, tb))
                  for ai, ta in a.items() for bi, tb in b.items()
                  if ta[:8] == tb[:8] and lev(ta, tb) <= 3)
    assert got == want, f"FUZZY mismatch: {[x for x in got if x not in set(want)][:3]}"
    twins = sum(1 for ai, bi, _ in want if bi - ai == 1000000)
    cross = len(want) - twins
    n_match = sum(1 for i in rows if i % 5 != 0)
    assert twins == n_match, f"suffix twins should all match: {twins} != {n_match}"
    print(f"fuzzy_join oracle OK: {len(want)} pairs ({twins} twins, {cross} cross)")

    # --- funnel_counts ---
    got = [tuple(int(x) for x in r) for r in con.execute(FUNNEL).fetchall()]
    evs = con.execute(
        "SELECT user_id, event_id, event_type, floor(epoch(ts))::BIGINT FROM events").fetchall()
    byu = defaultdict(list)
    for u, eid, t, sec in evs:
        byu[u].append((int(sec) * 10000000 + eid, t, int(sec)))
    W = 14400
    want = []
    for u in sorted(byu):
        ks = sorted(byu[u])
        views = [(k, s) for k, t, s in ks if t == "view"]
        if not views:
            continue
        vk = views[0][0]
        ck = next((k for k, t, s in ks if t == "click"
                   and any(vk2 < k and s - vs <= W for vk2, vs in views)), None)
        pk = next((k for k, t, s in ks if t == "purchase" and ck is not None
                   and k > ck and s - ck // 10000000 <= W), None)
        want.append((u, 1 + (ck is not None) + (pk is not None), vk // 10000000,
                     ck // 10000000 if ck else -1, pk // 10000000 if pk else -1))
    assert got == want, f"FUNNEL mismatch: {[x for x in got if x not in set(want)][:3]}"
    dist = defaultdict(int)
    for r in want:
        dist[r[1]] += 1
    assert len(dist) == 3, f"funnel must populate all three levels: {dict(dist)}"
    print(f"funnel_counts oracle OK: {len(want)} users, levels {dict(sorted(dist.items()))}")

    # --- hyperball_reach ---
    got = [(r[0], int(r[1]), int(r[2]), int(r[3]))
           for r in con.execute(HYPERBALL).fetchall()]
    und = set()
    for i in rows:
        for s, d in [(i % 7, (2 * i + 1) % 7)] + \
                    ([(i % 7, (3 * i + 2) % 7)] if i % 3 == 0 else []) + \
                    ([(i % 7, 0)] if i % 5 < 2 else []):
            if s != d:
                und.add((min(s, d), max(s, d)))
    hosts = sorted({x for e in und for x in e})
    adj = {h: {h} for h in hosts}
    for x, y in und:
        adj[x].add(y)
        adj[y].add(x)
    name = {h: f"site{h}.example.com" for h in hosts}
    regs = {}
    for h in hosts:
        hv = splitmix64(fnv(name[h]))
        idx, rest = hv >> 58, hv & ((1 << 58) - 1)
        regs[h] = {idx: 59 if rest == 0 else 58 - rest.bit_length() + 1}
    balls = {h: {h} for h in hosts}
    state = {h: dict(regs[h]) for h in hosts}
    want = []
    for r in (1, 2, 3):
        nstate, nballs = {}, {}
        for h in hosts:
            d = {}
            bb = set()
            for u in adj[h]:
                bb |= balls[u]
                for i, rho in state[u].items():
                    d[i] = max(d.get(i, 0), rho)
            nstate[h], nballs[h] = d, bb
        state, balls = nstate, nballs
        for h in hosts:
            z2 = sum(1 << (59 - state[h].get(i, 0)) for i in range(64))
            est = (709343 * 4096 * (1 << 59)) // (1000000 * z2)
            want.append((name[h], r, est, len(balls[h])))
    want.sort()
    assert got == want, f"HYPERBALL mismatch: got={got[:4]} want={want[:4]}"
    print(f"hyperball_reach oracle OK: {len(want)} rows; r3 sample {want[2]}")


if __name__ == "__main__":
    main()
