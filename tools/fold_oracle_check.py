import duckdb, re

SQL = r"""
WITH w0 AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
bench0 AS (SELECT doc_id AS bid, array_to_string(ws[1:13], ', ') AS mangled
           FROM w0 WHERE doc_id%41=0 AND len(ws)>=13),
pl AS (SELECT d.doc_id,
         CASE WHEN d.doc_id%7=5 AND b.mangled IS NOT NULL
              THEN d.text || ' ' || upper(b.mangled) ELSE d.text END AS text
       FROM documents d LEFT JOIN bench0 b ON b.bid = (d.doc_id%2)*41),
f AS (SELECT doc_id,
        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS text
      FROM pl),
fe AS (SELECT doc_id,
        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS text
      FROM documents WHERE doc_id%41=0),
w AS (SELECT doc_id, string_split(text,' ') AS ws FROM f),
g AS (SELECT doc_id, CASE WHEN len(ws) >= 13
             THEN [array_to_string(ws[i:i+12],' ') for i in range(1, len(ws)-11)]
             ELSE [] END AS grams FROM w),
we AS (SELECT doc_id, string_split(text,' ') AS ws FROM fe),
bench AS (SELECT DISTINCT array_to_string(ws[1:13],' ') AS gram FROM we WHERE len(ws)>=13),
x AS (SELECT doc_id, unnest(grams) AS gram FROM g),
m AS (SELECT x.doc_id, count(*) AS nc FROM x JOIN bench USING (gram) GROUP BY x.doc_id)
SELECT g.doc_id, CAST(len(g.grams) AS BIGINT) AS n_grams,
       CAST(coalesce(m.nc, 0) AS BIGINT) AS n_contaminated,
       coalesce(m.nc, 0) > 0 AS contaminated
FROM g LEFT JOIN m ON g.doc_id = m.doc_id ORDER BY g.doc_id
"""
con = duckdb.connect()
con.sql("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.01/documents.parquet'")
got = con.sql(SQL).fetchall()

docs = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
def fold(s):
    return re.sub(' +', ' ', re.sub('[^a-z0-9 ]', '', s.lower())).strip()
bench0 = {d: ', '.join(docs[d].split(' ')[:13]) for d in sorted(docs)
          if d % 41 == 0 and len(docs[d].split(' ')) >= 13}
planted = {}
for d in sorted(docs):
    m = bench0.get((d % 2) * 41)
    planted[d] = docs[d] + ' ' + m.upper() if (d % 7 == 5 and m is not None) else docs[d]
def grams(t):
    ws = t.split(' ')
    return [' '.join(ws[i:i+13]) for i in range(len(ws)-12)] if len(ws) >= 13 else []
evset = {g for d in bench0 for g in grams(fold(docs[d]))[:1]}
exp = []
for d in sorted(planted):
    gs = grams(fold(planted[d]))
    nc = sum(1 for g in gs if g in evset)
    exp.append((d, len(gs), nc, nc > 0))
assert got == exp, [(a, b) for a, b in zip(got, exp) if a != b][:3]
n_flag = sum(1 for r in exp if r[3])
print(f"OK {len(exp)} docs, {n_flag} flagged (exact decontaminate would miss the %7==5 mangled class)")
