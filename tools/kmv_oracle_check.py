"""Pre-wiring validation for the kmv_overlap oracle (CLAUDE.md rule):
recompute the KMV sketches + overlap estimates in plain Python (arbitrary-
precision ints, mod-2^64 splitmix64) and diff against the DuckDB oracle SQL,
at both test sfs.

Usage: python3 tools/kmv_oracle_check.py [sf_dir ...]
"""
import sys

import duckdb

K = 256
M64 = (1 << 64) - 1

ORACLE = """
WITH av AS (SELECT DISTINCT CAST(doc_id*2 AS HUGEINT) AS v FROM '{sf}/documents.parquet'),
bv AS (SELECT DISTINCT v FROM (
         SELECT CAST(doc_id*2 + CASE WHEN doc_id%5=1 THEN 1 ELSE 0 END AS HUGEINT) AS v
         FROM '{sf}/documents.parquet' WHERE doc_id%7<>3
         UNION ALL
         SELECT CAST((doc_id+1000000)*2 AS HUGEINT) FROM '{sf}/documents.parquet' WHERE doc_id%11=0)),
a1 AS (SELECT (v + 11400714819323198485) % 18446744073709551616 AS z FROM av),
a2 AS (SELECT xor(z, z >> 30) AS x FROM a1),
a3 AS (SELECT ((x % 4294967296) * 484763065
        + (((x % 4294967296) * 3210233709 + (x // 4294967296) * 484763065) % 4294967296) * 4294967296)
       % 18446744073709551616 AS z FROM a2),
a4 AS (SELECT xor(z, z >> 27) AS x FROM a3),
a5 AS (SELECT ((x % 4294967296) * 321982955
        + (((x % 4294967296) * 2496678331 + (x // 4294967296) * 321982955) % 4294967296) * 4294967296)
       % 18446744073709551616 AS z FROM a4),
ha AS (SELECT DISTINCT xor(z, z >> 31) AS h FROM a5),
b1 AS (SELECT (v + 11400714819323198485) % 18446744073709551616 AS z FROM bv),
b2 AS (SELECT xor(z, z >> 30) AS x FROM b1),
b3 AS (SELECT ((x % 4294967296) * 484763065
        + (((x % 4294967296) * 3210233709 + (x // 4294967296) * 484763065) % 4294967296) * 4294967296)
       % 18446744073709551616 AS z FROM b2),
b4 AS (SELECT xor(z, z >> 27) AS x FROM b3),
b5 AS (SELECT ((x % 4294967296) * 321982955
        + (((x % 4294967296) * 2496678331 + (x // 4294967296) * 321982955) % 4294967296) * 4294967296)
       % 18446744073709551616 AS z FROM b4),
hb AS (SELECT DISTINCT xor(z, z >> 31) AS h FROM b5),
sa AS (SELECT h FROM ha ORDER BY h LIMIT 256),
sb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
mk AS (SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb)
       ORDER BY h LIMIT 256),
mm AS (SELECT CAST(count(*) AS BIGINT) AS m, max(h) AS uk FROM mk),
mat AS (SELECT CAST(count(*) AS BIGINT) AS matches FROM mk
        WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb)),
exu AS (SELECT CAST(count(*) AS BIGINT) AS exact_union
        FROM (SELECT v FROM av UNION SELECT v FROM bv)),
exi AS (SELECT CAST(count(*) AS BIGINT) AS exact_inter FROM av
        WHERE v IN (SELECT v FROM bv)),
est AS (SELECT m, matches,
               CASE WHEN m < 256 THEN m
                    ELSE CAST((255 * CAST(18446744073709551616 AS HUGEINT)) // uk AS BIGINT)
               END AS est_union
        FROM mm, mat)
SELECT CAST(256 AS BIGINT) AS k, m, matches,
       matches * 10000 // m AS jaccard_bp,
       est_union,
       matches * est_union // m AS est_inter,
       exact_union, exact_inter,
       abs(est_union - exact_union) * 10000 // exact_union AS union_err_bp
FROM est, exu, exi
"""


def splitmix64(x):
    z = (x + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


CON = duckdb.connect()


def python_recompute(sf):
    con = CON
    ids = [r[0] for r in con.sql(
        f"SELECT doc_id FROM '{sf}/documents.parquet'").fetchall()]
    a = {i * 2 for i in ids}
    b = {i * 2 + (1 if i % 5 == 1 else 0) for i in ids if i % 7 != 3}
    b |= {(i + 1000000) * 2 for i in ids if i % 11 == 0}
    sa = sorted(splitmix64(v) for v in a)[:K]
    sb = sorted(splitmix64(v) for v in b)[:K]
    mk = sorted(set(sa) | set(sb))[:K]
    m = len(mk)
    matches = sum(1 for h in mk if h in set(sa) and h in set(sb))
    est_union = m if m < K else ((K - 1) * (1 << 64)) // mk[-1]
    exact_union = len(a | b)
    exact_inter = len(a & b)
    return (K, m, matches, matches * 10000 // m, est_union,
            matches * est_union // m, exact_union, exact_inter,
            abs(est_union - exact_union) * 10000 // exact_union)


def main():
    sfs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    ok = True
    for sf in sfs:
        py = python_recompute(sf)
        db = tuple(CON.sql(ORACLE.format(sf=sf)).fetchall()[0])
        match = py == db
        ok &= match
        print(f"{sf}: python={py}")
        print(f"{sf}: duckdb={db} -> {'OK' if match else 'MISMATCH'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
