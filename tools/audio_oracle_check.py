import duckdb

SPEC = open('/tmp/simkey_spec.txt').read()

SQL = r"""
WITH base AS (SELECT doc_id FROM documents),
clips AS (SELECT doc_id AS clip_id, doc_id AS d, 0 AS flip FROM base
          UNION ALL SELECT doc_id + 1000000, doc_id, 1 FROM base),
s AS (SELECT clip_id, CAST(64 + d%64 AS BIGINT) AS n,
        [ CASE WHEN flip = 1 AND ((d*7919 + 2663*i) % 65536) - 32768 != -32768
               THEN -(((d*7919 + 2663*i) % 65536) - 32768)
               ELSE ((d*7919 + 2663*i) % 65536) - 32768 END
          for i in range(0, 64 + d%64) ] AS sm
      FROM clips),
es AS (SELECT clip_id,
        [ coalesce(list_sum(list_transform(sm[(b*n//65)+1 : ((b+1)*n//65)], v -> v*v)), 0)
          for b in range(0, 65) ] AS e
       FROM s),
ah AS (SELECT clip_id,
              sum(CASE WHEN e[b+2] > e[b+1] THEN (1::HUGEINT << b) ELSE 0::HUGEINT END) AS v
       FROM es, range(64) r(b) GROUP BY clip_id, e),
spec(t, o0, w0, o1, w1, o2, w2) AS (VALUES __SPEC__),
keys AS (SELECT clip_id, v,
                CAST(t * (1::HUGEINT << 34)
                   + ((v // (1::HUGEINT << o0)) % (1::HUGEINT << w0)) * 4194304
                   + ((v // (1::HUGEINT << o1)) % (1::HUGEINT << w1)) * 2048
                   + ((v // (1::HUGEINT << o2)) % (1::HUGEINT << w2)) AS BIGINT) AS key
         FROM ah, spec),
cand AS (SELECT DISTINCT x.clip_id AS a, y.clip_id AS b, x.v AS va, y.v AS vb
         FROM keys x JOIN keys y USING (key) WHERE x.clip_id < y.clip_id)
SELECT a, b, CAST(bit_count(xor(
         CAST(va - CASE WHEN va >= (1::HUGEINT << 63) THEN (1::HUGEINT << 64) ELSE 0::HUGEINT END AS BIGINT),
         CAST(vb - CASE WHEN vb >= (1::HUGEINT << 63) THEN (1::HUGEINT << 64) ELSE 0::HUGEINT END AS BIGINT)))
       AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(
         CAST(va - CASE WHEN va >= (1::HUGEINT << 63) THEN (1::HUGEINT << 64) ELSE 0::HUGEINT END AS BIGINT),
         CAST(vb - CASE WHEN vb >= (1::HUGEINT << 63) THEN (1::HUGEINT << 64) ELSE 0::HUGEINT END AS BIGINT))) <= 3
ORDER BY a, b
""".replace("__SPEC__", SPEC)

con = duckdb.connect()
con.sql("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.01/documents.parquet'")
got = con.sql(SQL).fetchall()

ids = [r[0] for r in con.sql("SELECT doc_id FROM documents ORDER BY doc_id").fetchall()]
def samples(d, flip):
    out = []
    for i in range(64 + d % 64):
        v = ((d*7919 + 2663*i) % 65536) - 32768
        out.append(-v if (flip and v != -32768) else v)
    return out
def fp(sm):
    n = len(sm)
    e = []
    for b in range(65):
        lo, hi = b*n//65, (b+1)*n//65
        e.append(sum(v*v for v in sm[lo:hi]))
    v = 0
    for b in range(64):
        if e[b+1] > e[b]: v |= (1 << b)
    return v
fps = {}
for d in ids:
    fps[d] = fp(samples(d, 0))
    fps[d + 1000000] = fp(samples(d, 1))
# key-free recompute: all pairs hamming <= 3 (Manku keys are lossless there
# and the >3 key-collisions are filtered, so the banded result equals this)
ks = sorted(fps)
exp = []
for i, a in enumerate(ks):
    for b in ks[i+1:]:
        h = bin(fps[a] ^ fps[b]).count('1')
        if h <= 3: exp.append((a, b, h))
exp.sort()
assert got == exp, (len(got), len(exp), got[:3], exp[:3])
twins = sum(1 for a, b, h in exp if b - a == 1000000)
print(f"OK {len(exp)} pairs, {twins} planted twin pairs (expect 500, hamming 0), "
      f"{len(exp)-twins} cross-doc collisions")
