#!/usr/bin/env python3
"""Validate the cusum_bursts, zorder_layout, and dsir_select oracle SQL
against independent Python recomputes (CLAUDE.md rule).
Usage: round5c_check.py [sfDir]."""
import sys
from collections import Counter, defaultdict

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# CUSUM closed form: S_t = P_t - min(0, min_{s<=t} P_s) with
# P = prefix sum of (n_t - thr) over the DENSE per-type hour series
# (missing hours count 0 and drain the statistic — that is the point).
# thr = ceil(per-type mean per hour) + 1 (integer, scale-adaptive);
# alarm limit = thr + 2; a deterministic burst is planted (every 5th event
# re-emitted into one of three fixed wall-clock hours on 2024-01-15).
CUSUM = """
WITH all_e AS (
  SELECT event_id, event_type, ts FROM events
  UNION ALL
  SELECT event_id + 10000000, event_type,
         TIMESTAMP '2024-01-15 12:00:00' + to_hours(event_id%3) AS ts
  FROM events WHERE event_id%5=0),
ep AS (SELECT event_type, floor(epoch(ts))::BIGINT // 3600 AS b FROM all_e),
rng AS (SELECT event_type, min(b) AS lo, max(b) AS hi, count(*)::BIGINT AS total FROM ep GROUP BY 1),
th AS (SELECT event_type, lo, hi, (total + (hi-lo+1) - 1) // (hi-lo+1) + 1 AS thr FROM rng),
bk AS (SELECT event_type, thr, unnest([lo + i for i in range(0, hi - lo + 1)]) AS b FROM th),
cnt AS (SELECT event_type, b, count(*)::BIGINT AS n FROM ep GROUP BY 1, 2),
d AS (SELECT bk.event_type, bk.thr, bk.b, coalesce(cnt.n, 0)::BIGINT AS n
      FROM bk LEFT JOIN cnt USING (event_type, b)),
p AS (SELECT event_type, thr, b, n,
             sum(n - thr) OVER (PARTITION BY event_type ORDER BY b) AS pf FROM d),
m AS (SELECT event_type, thr, b, n, pf,
             least(0, min(pf) OVER (PARTITION BY event_type ORDER BY b)) AS mn FROM p)
SELECT event_type, CAST(b AS BIGINT) AS bucket, n, CAST(thr AS BIGINT) AS thr,
       CAST(pf - mn AS BIGINT) AS s,
       CAST(CASE WHEN pf - mn >= thr + 2 THEN 1 ELSE 0 END AS BIGINT) AS burst
FROM m ORDER BY event_type, bucket
"""

ZORDER = """
WITH z AS (SELECT doc_id, doc_id%32 AS d1, length(text)%32 AS d2 FROM documents),
zi AS (SELECT doc_id, d1, d2,
              list_sum([(((d1 >> i) & 1) << (2*i+1)) + (((d2 >> i) & 1) << (2*i))
                        for i in range(0, 5)]) AS zval FROM z),
f AS (SELECT doc_id, d1, d2, zval // 64 AS file_id FROM zi)
SELECT CAST(file_id AS BIGINT) AS file_id, count(*)::BIGINT AS n_rows,
       CAST(min(d1) AS BIGINT) AS min_d1, CAST(max(d1) AS BIGINT) AS max_d1,
       CAST(min(d2) AS BIGINT) AS min_d2, CAST(max(d2) AS BIGINT) AS max_d2
FROM f GROUP BY 1 ORDER BY file_id
"""

# dsir_select rides on the already-validated dsir_weights CTE chain
DSIR = """
WITH t AS (SELECT doc_id, lower(text) AS lt FROM documents),
tri AS (SELECT doc_id, unnest([substring(lt, i, 3) for i in range(1, length(lt)-1)]) AS tri
        FROM t WHERE length(lt) >= 3),
lmt AS (SELECT tri, CAST(count(*) AS BIGINT) AS ct FROM tri WHERE doc_id%10=0 GROUP BY tri),
lmr AS (SELECT tri, CAST(count(*) AS BIGINT) AS cr FROM tri WHERE doc_id%10>=5 GROUP BY tri),
tot AS (SELECT (SELECT coalesce(sum(ct),0) FROM lmt) AS tt, (SELECT coalesce(sum(cr),0) FROM lmr) AS tr),
sc AS (SELECT d.doc_id,
              CAST(length(bin(coalesce(lmt.ct,0)+1)) - length(bin(coalesce(lmr.cr,0)+1)) AS BIGINT) AS s
       FROM tri d LEFT JOIN lmt ON d.tri = lmt.tri LEFT JOIN lmr ON d.tri = lmr.tri),
w AS (SELECT doc_id,
             CAST(sum(s) + count(*) * (length(bin((SELECT tr FROM tot)+1)) - length(bin((SELECT tt FROM tot)+1))) AS BIGINT) AS weight_bits
      FROM sc GROUP BY doc_id),
r AS (SELECT doc_id, weight_bits,
             row_number() OVER (ORDER BY weight_bits DESC, doc_id) AS rnk FROM w)
SELECT doc_id, weight_bits, CAST(rnk AS BIGINT) AS rnk FROM r WHERE rnk <= 100
ORDER BY rnk
"""


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")

    # --- cusum_bursts ---
    got = [(r[0], int(r[1]), int(r[2]), int(r[3]), int(r[4]), int(r[5]))
           for r in con.execute(CUSUM).fetchall()]
    evs = con.execute(
        "SELECT event_id, event_type, floor(epoch(ts))::BIGINT FROM events").fetchall()
    bucket = defaultdict(Counter)
    planted_base = 1705320000 // 3600  # epoch('2024-01-15 12:00:00') // 3600
    for eid, t, sec in evs:
        bucket[t][int(sec) // 3600] += 1
        if eid % 5 == 0:
            bucket[t][planted_base + eid % 3] += 1
    want = []
    for t in sorted(bucket):
        lo, hi = min(bucket[t]), max(bucket[t])
        total = sum(bucket[t].values())
        h = hi - lo + 1
        thr = (total + h - 1) // h + 1
        s = 0
        for b in range(lo, hi + 1):
            n = bucket[t][b]
            s = max(0, s + n - thr)  # the recurrence the closed form replays
            want.append((t, b, n, thr, s, 1 if s >= thr + 2 else 0))
    assert got == want, f"CUSUM mismatch: {[x for x in got if x not in set(want)][:3]}"
    nb = sum(r[5] for r in want)
    assert 0 < nb < len(want) // 2, f"degenerate burst rate: {nb}/{len(want)}"
    print(f"cusum_bursts oracle OK: {len(want)} buckets, {nb} burst")

    # --- zorder_layout ---
    got = [tuple(int(x) for x in r) for r in con.execute(ZORDER).fetchall()]
    rows = con.execute("SELECT doc_id, length(text) FROM documents").fetchall()
    files = defaultdict(list)
    for i, ln in rows:
        d1, d2 = i % 32, ln % 32
        z = 0
        for k in range(5):
            z |= ((d1 >> k) & 1) << (2 * k + 1)
            z |= ((d2 >> k) & 1) << (2 * k)
        files[z // 64].append((d1, d2))
    want = sorted((f, len(v), min(x for x, _ in v), max(x for x, _ in v),
                   min(y for _, y in v), max(y for _, y in v))
                  for f, v in files.items())
    assert got == want, f"ZORDER mismatch: got={got[:3]} want={want[:3]}"
    # the z-order locality invariant: every 64-z-value file is an 8x8 tile
    for _, _, a, b, c, d in want:
        assert b - a <= 7 and d - c <= 7
    print(f"zorder_layout oracle OK: {len(want)} files, all 8x8 tiles")

    # --- dsir_select ---
    got = [tuple(int(x) for x in r) for r in con.execute(DSIR).fetchall()]
    wrows = con.execute("""
        WITH t AS (SELECT doc_id, lower(text) AS lt FROM documents),
        tri AS (SELECT doc_id, unnest([substring(lt, i, 3) for i in range(1, length(lt)-1)]) AS tri
                FROM t WHERE length(lt) >= 3)
        SELECT doc_id, tri FROM tri""").fetchall()
    lmt, lmr = Counter(), Counter()
    per = defaultdict(list)
    for i, tri in wrows:
        per[i].append(tri)
        if i % 10 == 0:
            lmt[tri] += 1
        if i % 10 >= 5:
            lmr[tri] += 1
    tt, tr = sum(lmt.values()), sum(lmr.values())
    wts = {}
    for i, tris in per.items():
        s = sum((lmt[t] + 1).bit_length() - (lmr[t] + 1).bit_length() for t in tris)
        wts[i] = s + len(tris) * ((tr + 1).bit_length() - (tt + 1).bit_length())
    order = sorted(wts.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    want = [(i, w, r + 1) for r, (i, w) in enumerate(order)]
    assert got == want, f"DSIR mismatch: got={got[:3]} want={want[:3]}"
    print(f"dsir_select oracle OK: top {len(want)}, cut at {want[-1][1]} bits")


if __name__ == "__main__":
    main()
