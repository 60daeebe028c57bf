import duckdb

SQL = r"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
bg AS (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] for i in range(1, len(ws))]) AS term FROM w),
p AS (SELECT DISTINCT term, doc_id FROM bg),
g AS (SELECT term, doc_id, doc_id - lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id) AS gap FROM p),
e AS (SELECT term, coalesce(gap, doc_id) AS v, gap FROM g)
SELECT term, CAST(count(*) AS BIGINT) AS df,
  CAST(sum(CASE WHEN v = 0 THEN 1 ELSE (length(bin(v)) + 6) // 7 END) AS BIGINT) AS index_bytes,
  CAST(8 * count(*) AS BIGINT) AS raw_bytes,
  CAST(max(gap) AS BIGINT) AS max_gap
FROM e GROUP BY term ORDER BY term
"""
con = duckdb.connect()
con.sql("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.01/documents.parquet'")
got = con.sql(SQL).fetchall()

docs = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
posts = {}
for d in sorted(docs):
    ws = docs[d].split(' ')
    for i in range(len(ws) - 1):
        posts.setdefault(ws[i] + ' ' + ws[i+1], set()).add(d)
def vb(v): return 1 if v == 0 else (v.bit_length() + 6) // 7
exp = []
for t in sorted(posts):
    ds = sorted(posts[t])
    gaps = [b - a for a, b in zip(ds, ds[1:])]
    enc = [ds[0]] + gaps
    exp.append((t, len(ds), sum(vb(v) for v in enc), 8 * len(ds), max(gaps) if gaps else None))
assert got == exp, [(g, e) for g, e in zip(got, exp) if g != e][:3]
tot_i = sum(r[2] for r in exp); tot_r = sum(r[3] for r in exp)
print(f"OK {len(exp)} terms, index {tot_i} B vs raw {tot_r} B ({tot_r/tot_i:.1f}x)")
