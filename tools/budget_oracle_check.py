import duckdb

SQL = r"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
q AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
      CAST(len(list_distinct(ws)) * 1000 // len(ws) AS BIGINT) AS quality_bp FROM w),
c AS (SELECT *, coalesce(sum(n_tokens) OVER (ORDER BY quality_bp DESC, doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM q)
SELECT doc_id, quality_bp, n_tokens, CAST(cb AS BIGINT) AS cum_before,
  cb < 13000 AS selected
FROM c ORDER BY doc_id
"""
con = duckdb.connect()
con.sql("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.01/documents.parquet'")
got = con.sql(SQL).fetchall()
docs = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
rows = []
for d, t in docs.items():
    ws = t.split(' ')
    rows.append((d, len(set(ws)) * 1000 // len(ws), len(ws)))
rows.sort(key=lambda r: (-r[1], r[0]))
exp, cum = {}, 0
for d, q, n in rows:
    exp[d] = (d, q, n, cum, cum < 13000)
    cum += n
exp = [exp[d] for d in sorted(exp)]
assert got == exp, [(g, e) for g, e in zip(got, exp) if g != e][:3]
sel = sum(1 for r in exp if r[4])
print(f"OK {len(exp)} docs, {sel} selected, total tokens {sum(r[2] for r in exp)}")
