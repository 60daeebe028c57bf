import duckdb

SQL = r"""
WITH n AS (SELECT max(doc_id) + 1 AS n FROM documents),
cps AS (SELECT DISTINCT cp FROM (
    SELECT (1::BIGINT << p) AS cp FROM range(0, 63) t(p), n WHERE (1::BIGINT << p) < n.n
    UNION ALL SELECT n FROM n)),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
big AS (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS term FROM w),
fs AS (SELECT term, min(doc_id) AS fd FROM tok GROUP BY term),
fb AS (SELECT term, min(doc_id) AS fd FROM big GROUP BY term),
dt AS (SELECT doc_id, len(ws) AS tc FROM w),
cum AS (SELECT c.cp AS docs_seen,
  CAST((SELECT count(*) FROM fs f WHERE f.fd < c.cp) AS BIGINT) AS vocab_size,
  CAST((SELECT count(*) FROM fb f WHERE f.fd < c.cp) AS BIGINT) AS bigram_vocab,
  CAST((SELECT coalesce(sum(tc), 0) FROM dt WHERE dt.doc_id < c.cp) AS BIGINT) AS token_count
  FROM cps c)
SELECT docs_seen, vocab_size, bigram_vocab, token_count,
  vocab_size - lag(vocab_size, 1, 0) OVER (ORDER BY docs_seen) AS new_terms,
  bigram_vocab - lag(bigram_vocab, 1, 0) OVER (ORDER BY docs_seen) AS new_bigrams
FROM cum ORDER BY docs_seen
"""

con = duckdb.connect()
con.sql("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.01/documents.parquet'")
got = con.sql(SQL).fetchall()

docs = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
N = max(docs) + 1
cps = sorted({1 << p for p in range(63) if (1 << p) < N} | {N})
fu, fbg = {}, {}
for d in sorted(docs):
    ws = docs[d].split(' ')
    for w_ in ws: fu.setdefault(w_, d)
    for i in range(len(ws) - 1): fbg.setdefault(ws[i] + ' ' + ws[i+1], d)
exp, pv, pb = [], 0, 0
for cp in cps:
    v = sum(1 for fd in fu.values() if fd < cp)
    b = sum(1 for fd in fbg.values() if fd < cp)
    t = sum(len(docs[d].split(' ')) for d in docs if d < cp)
    exp.append((cp, v, b, t, v - pv, b - pb)); pv, pb = v, b
assert got == exp, (got[:3], exp[:3])
def p2(fd): return 1 if fd == 0 else 1 << len(bin(fd)[2:])
from collections import Counter
bk = Counter(min(p2(fd), N) for fd in fbg.values())
assert all(bk.get(cp, 0) == row[5] for cp, row in zip(cps, exp)), "bigram bucket mismatch"
print("OK", len(exp), "checkpoints; curve:", [(r[0], r[2]) for r in exp])
