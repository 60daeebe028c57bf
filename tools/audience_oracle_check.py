"""Pre-wiring validation for the audience_overlap + stream_kmv_distinct
oracles (CLAUDE.md rule): recompute per-type KMV sketches over (user, day)
keys and the pairwise overlap matrix in plain Python, diff against the DuckDB
oracle SQL, at both test sfs.

Usage: python3 tools/audience_oracle_check.py [sf_dir ...]
"""
import sys

import duckdb

K = 256
M64 = (1 << 64) - 1

# per-(type, v)-distinct splitmix chain, shared formulation with hll_distinct
CHAIN = """
vals AS (SELECT DISTINCT event_type,
                CAST(user_id * 1024 + (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS HUGEINT) AS v
         FROM {src}),
h1 AS (SELECT event_type, v, (v + 11400714819323198485) % 18446744073709551616 AS z FROM vals),
h2 AS (SELECT event_type, v, xor(z, z >> 30) AS x FROM h1),
h3 AS (SELECT event_type, v, ((x % 4294967296) * 484763065
        + (((x % 4294967296) * 3210233709 + (x // 4294967296) * 484763065) % 4294967296) * 4294967296)
       % 18446744073709551616 AS z FROM h2),
h4 AS (SELECT event_type, v, xor(z, z >> 27) AS x FROM h3),
h5 AS (SELECT event_type, v, ((x % 4294967296) * 321982955
        + (((x % 4294967296) * 2496678331 + (x // 4294967296) * 321982955) % 4294967296) * 4294967296)
       % 18446744073709551616 AS z FROM h4),
h AS (SELECT event_type, v, xor(z, z >> 31) AS h FROM h5),
sk AS (SELECT event_type, h FROM
        (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h)
       WHERE rn <= 256)"""

OVERLAP = """
WITH """ + CHAIN + """,
pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b
          FROM (SELECT DISTINCT event_type FROM vals) a,
               (SELECT DISTINCT event_type FROM vals) b
          WHERE a.event_type < b.event_type),
mraw AS (SELECT DISTINCT p.type_a, p.type_b, u.h
         FROM pairs p JOIN sk u ON u.event_type IN (p.type_a, p.type_b)),
mk AS (SELECT type_a, type_b, h FROM
        (SELECT type_a, type_b, h,
                row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
         FROM mraw)
       WHERE rn <= 256),
mku AS (SELECT type_a, type_b, h FROM mk),
mm AS (SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS m, max(h) AS uk
       FROM mku GROUP BY type_a, type_b),
mat AS (SELECT m.type_a, m.type_b, CAST(count(*) AS BIGINT) AS matches
        FROM mku m
        JOIN sk a ON a.event_type = m.type_a AND a.h = m.h
        JOIN sk b ON b.event_type = m.type_b AND b.h = m.h
        GROUP BY m.type_a, m.type_b),
exi AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS exact_inter
        FROM vals x JOIN vals y ON x.v = y.v AND x.event_type < y.event_type
        GROUP BY 1, 2),
nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd FROM vals GROUP BY 1),
est AS (SELECT mm.type_a, mm.type_b, mm.m, mat.matches,
               CASE WHEN mm.m < 256 THEN mm.m
                    ELSE CAST((255 * CAST(18446744073709551616 AS HUGEINT)) // mm.uk AS BIGINT)
               END AS est_union,
               na.nd + nb.nd - exi.exact_inter AS exact_union, exi.exact_inter
        FROM mm JOIN mat USING (type_a, type_b) JOIN exi USING (type_a, type_b)
        JOIN nd na ON na.event_type = mm.type_a
        JOIN nd nb ON nb.event_type = mm.type_b)
SELECT type_a, type_b, m, matches,
       matches * 10000 // m AS jaccard_bp,
       est_union,
       matches * est_union // m AS est_inter,
       exact_union, exact_inter,
       abs(est_union - exact_union) * 10000 // exact_union AS union_err_bp
FROM est ORDER BY type_a, type_b
"""

STREAM_KMV = """
WITH """ + CHAIN + """,
mm AS (SELECT event_type, CAST(count(*) AS BIGINT) AS m, max(h) AS uk FROM sk GROUP BY 1)
SELECT event_type,
       CASE WHEN m < 256 THEN m
            ELSE CAST((255 * CAST(18446744073709551616 AS HUGEINT)) // uk AS BIGINT)
       END AS kmv_distinct
FROM mm ORDER BY event_type
"""


def splitmix64(x):
    z = (x + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


def python_recompute(sf, con):
    rows = con.sql(
        "SELECT event_type, user_id * 1024 + (CAST(floor(epoch(ts)) AS BIGINT) // 86400) "
        f"FROM '{sf}/events.parquet'").fetchall()
    by_type = {}
    for t, v in rows:
        by_type.setdefault(t, set()).add(v)
    sk = {t: sorted(splitmix64(v) for v in vs)[:K] for t, vs in by_type.items()}
    types = sorted(by_type)
    mat_rows, stream_rows = [], []
    for t in types:
        s = sk[t]
        est = len(s) if len(s) < K else ((K - 1) * (1 << 64)) // s[-1]
        stream_rows.append((t, est))
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            sa, sb = sk[ta], sk[tb]
            mk = sorted(set(sa) | set(sb))[:K]
            m = len(mk)
            matches = sum(1 for h in mk if h in set(sa) and h in set(sb))
            est_u = m if m < K else ((K - 1) * (1 << 64)) // mk[-1]
            exact_u = len(by_type[ta] | by_type[tb])
            exact_i = len(by_type[ta] & by_type[tb])
            mat_rows.append((ta, tb, m, matches, matches * 10000 // m, est_u,
                             matches * est_u // m, exact_u, exact_i,
                             abs(est_u - exact_u) * 10000 // exact_u))
    return mat_rows, stream_rows


def main():
    sfs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    con = duckdb.connect()
    ok = True
    for sf in sfs:
        src = f"'{sf}/events.parquet'"
        py_m, py_s = python_recompute(sf, con)
        db_m = [tuple(r) for r in con.sql(OVERLAP.format(src=src)).fetchall()]
        db_s = [tuple(r) for r in con.sql(STREAM_KMV.format(src=src)).fetchall()]
        m_ok, s_ok = py_m == db_m, py_s == db_s
        ok &= m_ok and s_ok
        print(f"{sf}: matrix rows={len(py_m)} -> {'OK' if m_ok else 'MISMATCH'}; "
              f"stream rows={len(py_s)} -> {'OK' if s_ok else 'MISMATCH'}")
        if not m_ok:
            for p, d in zip(py_m, db_m):
                if p != d:
                    print("  matrix diff:", p, "vs", d)
                    break
        if not s_ok:
            print("  stream:", py_s, "vs", db_s)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
