import duckdb

SQL = r"""
WITH ev0 AS (SELECT doc_id AS eid, text FROM documents WHERE doc_id%41=0),
pl AS (SELECT d.doc_id,
         CASE WHEN d.doc_id%7=6 AND e.text IS NOT NULL
              THEN substring(e.text, instr(e.text,' ')+1) ELSE d.text END AS text
       FROM documents d LEFT JOIN ev0 e ON e.eid = (d.doc_id%2)*41),
cw AS (SELECT doc_id, string_split(text,' ') AS w FROM pl),
cs AS (SELECT doc_id, CASE WHEN len(w) < 3 THEN [array_to_string(w,' ')]
            ELSE list_distinct([array_to_string(w[i:i+1],' ') for i in range(1, len(w))]) END AS s FROM cw),
ew AS (SELECT eid, string_split(text,' ') AS w FROM ev0),
es AS (SELECT eid, CASE WHEN len(w) < 3 THEN [array_to_string(w,' ')]
            ELSE list_distinct([array_to_string(w[i:i+1],' ') for i in range(1, len(w))]) END AS s FROM ew),
pairs AS (SELECT c.doc_id, e.eid, len(list_intersect(c.s, e.s)) AS inter,
                 len(c.s) + len(e.s) - len(list_intersect(c.s, e.s)) AS un
          FROM cs c CROSS JOIN es e),
q AS (SELECT doc_id, eid FROM pairs WHERE inter*5 >= un*4)
SELECT c.doc_id, CAST(count(q.eid) AS BIGINT) AS n_eval_matches,
       CAST(coalesce(min(q.eid), -1) AS BIGINT) AS eval_doc_id,
       count(q.eid) > 0 AS contaminated
FROM cs c LEFT JOIN q ON q.doc_id = c.doc_id
GROUP BY c.doc_id ORDER BY c.doc_id
"""
con = duckdb.connect()
con.sql("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.01/documents.parquet'")
got = con.sql(SQL).fetchall()

docs = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
ev = {d: docs[d] for d in sorted(docs) if d % 41 == 0}
def sh(t):
    w = t.split(' ')
    return {t} if len(w) < 3 else {' '.join(w[i:i+2]) for i in range(len(w)-1)}
planted = {}
for d in sorted(docs):
    e = ev.get((d % 2) * 41)
    planted[d] = e[e.index(' ')+1:] if (d % 7 == 6 and e is not None) else docs[d]
evs = {e: sh(t) for e, t in ev.items()}
exp = []
for d in sorted(planted):
    s = sh(planted[d])
    hits = sorted(e for e, es_ in evs.items()
                  if 5*len(s & es_) >= 4*(len(s)+len(es_)-len(s & es_)))
    exp.append((d, len(hits), hits[0] if hits else -1, bool(hits)))
assert got == exp, [(a,b) for a,b in zip(got,exp) if a != b][:3]
n = sum(1 for r in exp if r[3])
print(f"OK {len(exp)} docs, {n} contaminated (planted %7==6 near-copies + eval selves)")
