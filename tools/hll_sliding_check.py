#!/usr/bin/env python3
"""Pre-wiring validation for the hll_sliding oracle (CLAUDE.md rule: validate
oracle SQL against a Python recompute BEFORE wiring).
Run: python3 tools/hll_sliding_check.py /root/testdata/sf0.01
"""
import sys, duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
W = 7
con = duckdb.connect()
con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")

SQL = f"""WITH vals AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(user_id * 1024 + (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS HUGEINT) AS v
  FROM events),
h1 AS (SELECT event_type, day, (v + 11400714819323198485) % 18446744073709551616 AS z FROM vals),
h2 AS (SELECT event_type, day, xor(z, z >> 30) AS x FROM h1),
h3 AS (SELECT event_type, day,
         ((x % 4294967296) * 484763065
          + (((x % 4294967296) * 3210233709 + (x // 4294967296) * 484763065) % 4294967296) * 4294967296)
         % 18446744073709551616 AS z
       FROM h2),
h4 AS (SELECT event_type, day, xor(z, z >> 27) AS x FROM h3),
h5 AS (SELECT event_type, day,
         ((x % 4294967296) * 321982955
          + (((x % 4294967296) * 2496678331 + (x // 4294967296) * 321982955) % 4294967296) * 4294967296)
         % 18446744073709551616 AS z
       FROM h4),
hh AS (SELECT event_type, day, xor(z, z >> 31) AS h FROM h5),
b AS (SELECT event_type, day, CAST(h // 288230376151711744 AS BIGINT) AS idx,
             h % 288230376151711744 AS rest FROM hh),
r AS (SELECT event_type, day, idx,
             max(CASE WHEN rest = 0 THEN 59 ELSE 58 - len(bin(rest)) + 1 END) AS rho
      FROM b GROUP BY event_type, day, idx),
grid AS (SELECT DISTINCT event_type, day FROM vals),
gi AS (SELECT g.event_type, g.day, x.i AS idx
       FROM grid g, UNNEST(generate_series(0, 63)) x(i)),
regs AS (SELECT gi.event_type, gi.day, gi.idx, coalesce(max(r.rho), 0) AS rho
         FROM gi LEFT JOIN r ON r.event_type = gi.event_type AND r.idx = gi.idx
                            AND r.day BETWEEN gi.day - {W - 1} AND gi.day
         GROUP BY gi.event_type, gi.day, gi.idx),
est AS (SELECT event_type, day, sum(CAST(1 AS HUGEINT) << (59 - rho)) AS z2
        FROM regs GROUP BY event_type, day),
estv AS (SELECT event_type, day,
           CAST((709343 * CAST(4096 AS HUGEINT) * 576460752303423488) // (1000000 * z2) AS BIGINT) AS e
         FROM est),
vd AS (SELECT DISTINCT event_type, v, day FROM vals),
exact AS (SELECT g.event_type, g.day, count(DISTINCT f.v) AS ex FROM grid g
          JOIN vd f ON f.event_type = g.event_type
                   AND f.day BETWEEN g.day - {W - 1} AND g.day
          GROUP BY g.event_type, g.day)
SELECT estv.event_type, CAST(estv.day AS BIGINT) AS day, e AS win_distinct_est,
       CAST(ex AS BIGINT) AS win_distinct_exact,
       CAST(abs(e - ex) * 10000 // ex AS BIGINT) AS err_bp
FROM estv JOIN exact USING (event_type, day)
ORDER BY event_type, day"""

MASK = (1 << 64) - 1


def splitmix64(x):
    z = (x + 0x9E3779B97F4A7C15) & MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
    return z ^ (z >> 31)


def main():
    sql = con.execute(SQL).fetchall()
    ev = con.execute(
        "SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day, user_id FROM events"
    ).fetchall()
    regs, vseen, days = {}, {}, {}
    for t, day, uid in ev:
        v = (uid * 1024 + day) & MASK
        h = splitmix64(v)
        idx, rest = h >> 58, h & ((1 << 58) - 1)
        rho = 59 if rest == 0 else 58 - rest.bit_length() + 1
        key = (t, day, idx)
        if regs.get(key, 0) < rho:
            regs[key] = rho
        vseen.setdefault((t, v), set()).add(day)
        days.setdefault(t, set()).add(day)
    want = []
    for t in sorted(days):
        for d in sorted(days[t]):
            lo = d - (W - 1)
            z2 = 0
            for idx in range(64):
                rho = max((r for (tt, dd, ii), r in regs.items()
                           if tt == t and ii == idx and lo <= dd <= d), default=0)
                z2 += 1 << (59 - rho)
            e = (709343 * 4096 * (1 << 59)) // (1000000 * z2)
            ex = sum(1 for (tt, _), ds in vseen.items()
                     if tt == t and any(lo <= dd <= d for dd in ds))
            want.append((t, d, e, ex, abs(e - ex) * 10000 // ex))
    ok = sql == want
    if not ok:
        for a, b in zip(sql, want):
            if a != b:
                print(f"  MISMATCH: sql={a} py={b}")
    print(f"hll_sliding: {'OK' if ok else 'MISMATCH'} ({len(sql)} rows, {len(want)} expected)")
    return ok


sys.exit(0 if main() else 1)
