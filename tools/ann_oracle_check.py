import duckdb, math

M = (1 << 64) - 1
def sm64(x0):
    x = (x0 + 0x9E3779B97F4A7C15) & M
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & M
    return x ^ (x >> 31)

LSH_SEED = 0xA11CE000
LSH_BITS, LSH_TABLES, MAXBITS, DIM = 6, 4, 32, 64
signs = [[[1 if sm64((LSH_SEED + ((t * MAXBITS + b) * DIM + d)) & M) & 1 else -1
           for d in range(DIM)] for b in range(MAXBITS)] for t in range(LSH_TABLES)]

SF = '/root/testdata/sf0.01'
con = duckdb.connect()
rows = con.sql(f"SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM '{SF}/embeddings.parquet' ORDER BY vec_id").fetchall()
vecs = {r[0]: r[1] for r in rows}

def quantize(v): return [math.trunc(x * 4096.0) for x in v]
def cosine(a, b):
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += x * y; na += x * x; nb += y * y
    return 0.0 if na == 0 or nb == 0 else dot / math.sqrt(na * nb)

def bucket(q, t, bits=LSH_BITS):
    bk = 0
    for b in range(bits):
        dot = sum(s * x for s, x in zip(signs[t][b], q))
        if dot >= 0: bk |= (1 << b)
    return (t << 32) | bk

qids = sorted(vecs)[:5]
K = 5

# ---- python reference: LSH ----
index = {}
for vid, v in vecs.items():
    q = quantize(v)
    for t in range(LSH_TABLES):
        index.setdefault(bucket(q, t), []).append(vid)
def lsh_topk(qid):
    qv = vecs[qid]; q = quantize(qv)
    cands = set()
    for t in range(LSH_TABLES):
        b0 = bucket(q, t)
        for bb in [b0] + [b0 ^ (1 << i) for i in range(LSH_BITS)]:
            cands.update(index.get(bb, []))
    cands.discard(qid)
    scored = sorted(((cosine(qv, vecs[c]), c) for c in cands), key=lambda x: (-x[0], x[1]))[:K]
    return [(qid, c, r + 1, round(s, 6)) for r, (s, c) in enumerate(scored)]

def bf_topk(qid):
    qv = vecs[qid]
    scored = sorted(((cosine(qv, vecs[c]), c) for c in vecs if c != qid), key=lambda x: (-x[0], x[1]))[:K]
    return {c for s, c in scored}

py_lsh = []
for qid in qids:
    bf = bf_topk(qid)
    for (q, c, r, s) in lsh_topk(qid):
        py_lsh.append((q, c, r, s, 1 if c in bf else 0))

# ---- python reference: IVF ----
NLIST, NPROBE = 16, 4
ordered = [vecs[v] for v in sorted(vecs)][:10000]
stride = len(ordered) // NLIST
cents = [quantize(ordered[i * stride]) for i in range(NLIST)]
def sqd(a, b): return sum((x - y) ** 2 for x, y in zip(a, b))
assign = {vid: min(range(NLIST), key=lambda c: (sqd(quantize(v), cents[c]), c)) for vid, v in vecs.items()}
def ivf_topk(qid):
    qv = vecs[qid]; q = quantize(qv)
    probes = sorted(range(NLIST), key=lambda c: (sqd(q, cents[c]), c))[:NPROBE]
    cands = [vid for vid, l in assign.items() if l in probes and vid != qid]
    scored = sorted(((cosine(qv, vecs[c]), c) for c in cands), key=lambda x: (-x[0], x[1]))[:K]
    return [(qid, c, r + 1, round(s, 6)) for r, (s, c) in enumerate(scored)]
py_ivf = []
for qid in qids:
    bf = bf_topk(qid)
    for (q, c, r, s) in ivf_topk(qid):
        py_ivf.append((q, c, r, s, 1 if c in bf else 0))

sg_lit = "[" + ",".join(str(s) for t in range(LSH_TABLES) for b in range(LSH_BITS) for s in signs[t][b]) + "]"

LSH_SQL = f"""
WITH sg AS (SELECT {sg_lit}::BIGINT[] AS s),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             [trunc(x*4096)::BIGINT for x in CAST(embedding AS DOUBLE[])] AS q
      FROM embeddings),
bits AS (
  SELECT vec_id, t, b,
         CASE WHEN list_sum([sg.s[(t*6+b)*64 + d] * q[d] for d in range(1,65)]) >= 0
              THEN (1::BIGINT << b) ELSE 0::BIGINT END AS bit
  FROM e, sg, range(4) rt(t), range(6) rb(b)),
eb AS (SELECT vec_id, (t::BIGINT << 32) | sum(bit)::BIGINT AS bucket FROM bits GROUP BY vec_id, t),
q5 AS (SELECT vec_id AS query_id, v AS qv FROM e ORDER BY vec_id LIMIT 5),
qbase AS (SELECT query_id, bucket FROM eb JOIN q5 ON eb.vec_id = q5.query_id),
qprobe AS (SELECT DISTINCT query_id,
                  unnest(list_prepend(bucket, [xor(bucket, (1::BIGINT << b)) for b in range(0,6)])) AS bucket
           FROM qbase),
cand AS (SELECT DISTINCT query_id, eb.vec_id
         FROM qprobe JOIN eb USING (bucket) WHERE eb.vec_id != query_id),
scored AS (SELECT c.query_id, c.vec_id AS neighbor_id,
                  list_cosine_similarity(q5.qv, e.v) AS rawsim
           FROM cand c JOIN q5 USING (query_id) JOIN e ON e.vec_id = c.vec_id),
ranked AS (SELECT query_id, neighbor_id, round(rawsim, 6) AS sim,
                  row_number() OVER (PARTITION BY query_id ORDER BY rawsim DESC, neighbor_id) AS rank
           FROM scored),
bf AS (SELECT query_id, neighbor_id FROM (
         SELECT q5.query_id, e.vec_id AS neighbor_id,
                row_number() OVER (PARTITION BY q5.query_id
                                   ORDER BY list_cosine_similarity(q5.qv, e.v) DESC, e.vec_id) AS r
         FROM q5, e WHERE e.vec_id != q5.query_id)
       WHERE r <= 5)
SELECT r.query_id, r.neighbor_id, r.rank, r.sim,
       CASE WHEN bf.neighbor_id IS NOT NULL THEN 1::BIGINT ELSE 0::BIGINT END AS hit
FROM ranked r LEFT JOIN bf USING (query_id, neighbor_id)
WHERE r.rank <= 5
"""

IVF_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                  [trunc(x*4096)::BIGINT for x in CAST(embedding AS DOUBLE[])] AS q
           FROM embeddings),
head AS (SELECT q, row_number() OVER (ORDER BY vec_id) - 1 AS pos FROM e QUALIFY pos < 10000),
n AS (SELECT count(*) AS ns FROM head),
cent AS (SELECT CAST(pos // (ns // 16) AS BIGINT) AS list_id, q AS cq
         FROM head, n WHERE pos % (ns // 16) = 0 AND pos // (ns // 16) < 16),
dists AS (SELECT e.vec_id, c.list_id,
                 list_sum([(e.q[d]-c.cq[d])*(e.q[d]-c.cq[d]) for d in range(1,65)]) AS dist
          FROM e, cent c),
asn AS (SELECT vec_id, list_id FROM (
          SELECT vec_id, list_id,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS r
          FROM dists) WHERE r = 1),
q5 AS (SELECT vec_id AS query_id, v AS qv FROM e ORDER BY vec_id LIMIT 5),
probe AS (SELECT query_id, list_id FROM (
            SELECT q5.query_id, d.list_id,
                   row_number() OVER (PARTITION BY q5.query_id ORDER BY d.dist, d.list_id) AS r
            FROM q5 JOIN dists d ON d.vec_id = q5.query_id) WHERE r <= 4),
cand AS (SELECT DISTINCT p.query_id, a.vec_id
         FROM probe p JOIN asn a USING (list_id) WHERE a.vec_id != p.query_id),
scored AS (SELECT c.query_id, c.vec_id AS neighbor_id,
                  list_cosine_similarity(q5.qv, e.v) AS rawsim
           FROM cand c JOIN q5 USING (query_id) JOIN e ON e.vec_id = c.vec_id),
ranked AS (SELECT query_id, neighbor_id, round(rawsim, 6) AS sim,
                  row_number() OVER (PARTITION BY query_id ORDER BY rawsim DESC, neighbor_id) AS rank
           FROM scored),
bf AS (SELECT query_id, neighbor_id FROM (
         SELECT q5.query_id, e.vec_id AS neighbor_id,
                row_number() OVER (PARTITION BY q5.query_id
                                   ORDER BY list_cosine_similarity(q5.qv, e.v) DESC, e.vec_id) AS r
         FROM q5, e WHERE e.vec_id != q5.query_id)
       WHERE r <= 5)
SELECT r.query_id, r.neighbor_id, r.rank, r.sim,
       CASE WHEN bf.neighbor_id IS NOT NULL THEN 1::BIGINT ELSE 0::BIGINT END AS hit
FROM ranked r LEFT JOIN bf USING (query_id, neighbor_id)
WHERE r.rank <= 5
"""

con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
for name, sql, ref in [("lsh", LSH_SQL, py_lsh), ("ivf", IVF_SQL, py_ivf)]:
    got = sorted(tuple(r) for r in con.sql(sql).fetchall())
    want = sorted(ref)
    print(name, "rows sql/py:", len(got), len(want), "match:", got == want)
    if got != want:
        for g, w in zip(got, want):
            if g != w:
                print("  first diff sql:", g, "py:", w)
                break
    nh = sum(r[4] for r in want)
    print(f"  {name} total hits: {nh}/{len(want)} (recall {nh/25:.2f})")
