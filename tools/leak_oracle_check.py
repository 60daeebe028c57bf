import duckdb

SQL = r"""
WITH w0 AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
bench AS (SELECT doc_id AS bid, array_to_string(ws[1:13],' ') AS gram
          FROM w0 WHERE doc_id%41=0 AND len(ws)>=13),
pl AS (SELECT d.doc_id,
         CASE WHEN d.doc_id%7=3 AND b.gram IS NOT NULL
              THEN d.text || ' ' || b.gram ELSE d.text END AS text
       FROM documents d LEFT JOIN bench b ON b.bid = (d.doc_id%2)*41),
w AS (SELECT doc_id, string_split(text,' ') AS ws FROM pl),
g AS (SELECT doc_id, CASE WHEN len(ws) >= 13
             THEN [array_to_string(ws[i:i+12],' ') for i in range(1, len(ws)-11)]
             ELSE [] END AS grams FROM w),
ev AS (SELECT bid AS eval_doc_id, gram FROM bench),
x AS (SELECT doc_id, unnest(grams) AS gram FROM g),
hits AS (SELECT DISTINCT x.gram, x.doc_id FROM x JOIN (SELECT DISTINCT gram FROM ev) b USING (gram)),
agg AS (SELECT gram, CAST(count(*) AS BIGINT) AS n_docs_hit,
        CAST(min(doc_id) AS BIGINT) AS min_hit_doc FROM hits GROUP BY gram)
SELECT ev.eval_doc_id, ev.gram, agg.n_docs_hit, agg.min_hit_doc,
       agg.n_docs_hit > 1 AS leaked_beyond_self
FROM ev JOIN agg USING (gram) ORDER BY ev.eval_doc_id
"""
con = duckdb.connect()
con.sql("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.01/documents.parquet'")
got = con.sql(SQL).fetchall()

docs = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
def grams(t):
    ws = t.split(' ')
    return [' '.join(ws[i:i+13]) for i in range(len(ws)-12)] if len(ws) >= 13 else []
bench = {d: grams(docs[d])[0] for d in sorted(docs) if d % 41 == 0 and grams(docs[d])}
planted = {}
for d in sorted(docs):
    t = docs[d]
    head = bench.get((d % 2) * 41)
    planted[d] = t + ' ' + head if (d % 7 == 3 and head is not None) else t
evset = set(bench.values())
hits = {}
for d in sorted(planted):
    for g in set(grams(planted[d])):
        if g in evset:
            hits.setdefault(g, set()).add(d)
exp = [(d, g, len(hits[g]), min(hits[g]), len(hits[g]) > 1) for d, g in sorted(bench.items())]
assert got == exp, [(a, b) for a, b in zip(got, exp) if a != b][:3]
print(f"OK {len(exp)} eval items; leaked beyond self: {sum(1 for r in exp if r[4])};"
      f" max hits {max(r[2] for r in exp)}")
