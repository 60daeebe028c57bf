import duckdb

SQL = r"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tw AS (SELECT doc_id + 1000000 AS doc_id,
  array_to_string([CASE WHEN (i-1)%16 = 3 THEN 'e'||(i-1) ELSE ws[i] END
                   for i in range(1, len(ws)+1)], ' ') AS text FROM w),
corpus AS (SELECT doc_id, text FROM documents UNION ALL SELECT doc_id, text FROM tw),
cand AS (SELECT doc_id AS a, doc_id + 1000000 AS b FROM documents
         UNION ALL SELECT doc_id AS a, doc_id + 1000001 AS b FROM documents),
j AS (SELECT c.a, c.b, x.text AS ta, y.text AS tb
      FROM cand c JOIN corpus x ON x.doc_id = c.a JOIN corpus y ON y.doc_id = c.b)
SELECT a, b,
  CAST(least(levenshtein(ta, tb), greatest(length(ta), length(tb)) // 5 + 1) AS BIGINT) AS edit_dist,
  CAST(greatest(length(ta), length(tb)) AS BIGINT) AS max_len,
  5 * least(levenshtein(ta, tb), greatest(length(ta), length(tb)) // 5 + 1)
    <= greatest(length(ta), length(tb)) AS is_dup
FROM j ORDER BY a, b
"""

def lev(a, b):
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j-1] + 1, prev[j-1] + (a[i-1] != b[j-1]))
        prev = cur
    return prev[n]

con = duckdb.connect()
con.sql("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.01/documents.parquet'")
got = con.sql(SQL).fetchall()

# python recompute
docs = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
def twin(t):
    ws = t.split(' ')
    return ' '.join('e%d' % i if i % 16 == 3 else w for i, w in enumerate(ws))
corpus = dict(docs)
corpus.update({k + 1000000: twin(v) for k, v in docs.items()})
exp = []
for d in sorted(docs):
    for b in (d + 1000000, d + 1000001):
        if b not in corpus: continue
        ta, tb = corpus[d], corpus[b]
        L = max(len(ta), len(tb))
        cap = L // 5 + 1
        dd = min(lev(ta, tb), cap)
        exp.append((d, b, dd, L, 5 * dd <= L))
exp.sort()
assert len(got) == len(exp), (len(got), len(exp))
bad = [(g, e) for g, e in zip(got, exp) if g != e]
assert not bad, bad[:3]
pos = sum(1 for r in exp if r[4]); neg = len(exp) - pos
print(f"OK {len(exp)} pairs, {pos} dup (expect 500 twins), {neg} rejected (expect 499 decoys)")
