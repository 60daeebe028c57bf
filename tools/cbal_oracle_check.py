import duckdb

SQL = r"""
WITH e AS (SELECT vec_id, [trunc(x*4096)::BIGINT for x in CAST(embedding AS DOUBLE[])] AS q FROM embeddings),
head AS (SELECT q, row_number() OVER (ORDER BY vec_id) - 1 AS pos FROM e QUALIFY pos < 10000),
n AS (SELECT count(*) AS ns FROM head),
cent AS (SELECT CAST(pos // (ns // 16) AS BIGINT) AS list_id, q AS cq
         FROM head, n WHERE pos % (ns // 16) = 0 AND pos // (ns // 16) < 16),
dists AS (SELECT e.vec_id, c.list_id,
                 list_sum([(e.q[d]-c.cq[d])*(e.q[d]-c.cq[d]) for d in range(1,65)]) AS dist
          FROM e, cent c),
asn AS (SELECT vec_id, list_id FROM (
          SELECT vec_id, list_id, row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS r
          FROM dists) WHERE r = 1),
k AS (SELECT vec_id, list_reduce(
           list_prepend(14695981039346656037::HUGEINT,
                        [unicode(c)::HUGEINT for c in string_split('cbal:' || vec_id, '')]),
           (h, b) -> ((h - h % 128 + xor((h % 128)::BIGINT, b::BIGINT)::HUGEINT)
                      * 1099511628211::HUGEINT) % (1::HUGEINT << 64)) AS h
      FROM embeddings),
ks AS (SELECT a.vec_id, a.list_id, (k.h % (1::HUGEINT << 32)) AS priority
       FROM asn a JOIN k USING (vec_id)),
c AS (SELECT list_id, count(*)::BIGINT AS n_cell FROM ks GROUP BY list_id),
q AS (SELECT list_id, n_cell,
             (100*n_cell)//(sum(n_cell) OVER ()) AS base,
             (100*n_cell)%(sum(n_cell) OVER ()) AS rem
      FROM c),
q2 AS (SELECT list_id, n_cell, base, rem,
              100 - sum(base) OVER () AS leftover,
              row_number() OVER (ORDER BY rem DESC, list_id) AS seat_rank
       FROM q),
q3 AS (SELECT list_id, n_cell,
              least(base + CASE WHEN seat_rank <= leftover THEN 1 ELSE 0 END, n_cell) AS quota
       FROM q2),
r AS (SELECT vec_id, list_id, row_number() OVER (PARTITION BY list_id ORDER BY priority, vec_id) AS rnk
      FROM ks)
SELECT r.vec_id, r.list_id, CAST(r.rnk AS BIGINT) AS rnk,
       CAST(q3.quota AS BIGINT) AS quota, q3.n_cell
FROM r JOIN q3 USING (list_id) WHERE r.rnk <= q3.quota ORDER BY vec_id
"""
con = duckdb.connect()
con.sql("CREATE VIEW embeddings AS SELECT * FROM '/root/testdata/sf0.01/embeddings.parquet'")
got = con.sql(SQL).fetchall()

import math
rows = con.sql("SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM embeddings ORDER BY vec_id").fetchall()
def quant(v): return [math.trunc(x*4096) for x in v]
qs = {vid: quant(v) for vid, v in rows}
# match the engine's seededCentroids sampleCap=10000 (and the SQL oracle's
# QUALIFY pos < 10000): centroids come from the first 10000 vec_ids only —
# ADVICE r5: without the cap this recompute only agrees at sf0.01 by luck
# (8000 vectors) and would report a spurious mismatch on larger datasets
ids = sorted(qs)[:10000]
stride = len(ids) // 16
cents = [qs[ids[i*stride]] for i in range(16)]
def nearest(q):
    best, bd = 0, None
    for i, c in enumerate(cents):
        d = sum((a-b)*(a-b) for a, b in zip(q, c))
        if bd is None or d < bd: bd, best = d, i
    return best
def fnv(s):
    h = 14695981039346656037
    for ch in s:
        h = ((h ^ ord(ch)) * 1099511628211) % (1 << 64)
    return h
cells = {}
for vid in ids:
    cells.setdefault(nearest(qs[vid]), []).append(vid)
ncells = {c: len(v) for c, v in cells.items()}
total = sum(ncells.values())
base = {c: 100*n0//total for c, n0 in ncells.items()}
rem = {c: 100*ncells[c] % total for c in ncells}
leftover = 100 - sum(base.values())
order = sorted(ncells, key=lambda c: (-rem[c], c))
quota = {c: min(base[c] + (1 if i < leftover else 0), ncells[c]) for i, c in enumerate(order)}
exp = []
for cell, members in cells.items():
    ranked = sorted(members, key=lambda v: (fnv('cbal:%d' % v) % (1 << 32), v))
    for i, vid in enumerate(ranked):
        if i + 1 <= quota[cell]:
            exp.append((vid, cell, i + 1, quota[cell], ncells[cell]))
exp.sort()
assert got == exp, ((len(got), len(exp)), [(a, b) for a, b in zip(got, exp) if a != b][:3])
print(f"OK {len(exp)} sampled over {len(ncells)} cells; quotas {sorted(quota.values())}")
