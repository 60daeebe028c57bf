import duckdb
con = duckdb.connect()
doc = "/root/testdata/sf0.01/documents.parquet"
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{doc}'")

# ---- hreflang_clusters oracle ----
hre_sql = """
WITH fam AS (
  SELECT doc_id, (['en','de','fr','es'])[1:(1 + doc_id % 4)] AS langs FROM documents),
alt AS (
  SELECT doc_id, unnest(langs) AS l, len(langs)::BIGINT AS n_langs FROM fam),
rows_ AS (
  SELECT doc_id, l AS hreflang,
         'https://site'||(doc_id%7)||'.example.com/'||l||'/doc'||doc_id||'.html' AS href,
         n_langs
  FROM alt)
SELECT min(href) OVER (PARTITION BY doc_id) AS cluster, hreflang, href, n_langs
FROM rows_
"""
got = sorted(map(tuple, con.execute(hre_sql).fetchall()))
# independent recompute
rows = con.execute("SELECT doc_id FROM documents").fetchall()
exp = []
langs4 = ['en','de','fr','es']
for (i,) in rows:
    nv = 1 + i % 4
    ls = langs4[:nv]
    hrefs = {l: f"https://site{i%7}.example.com/{l}/doc{i}.html" for l in ls}
    c = min(hrefs.values())
    for l in ls:
        exp.append((c, l, hrefs[l], nv))
exp = sorted(exp)
print("hreflang rows:", len(got), "match:", got == exp)
if got != exp:
    print("got[:3]", got[:3]); print("exp[:3]", exp[:3])

# ---- bitext_mine oracle ----
bt_sql = """
WITH w AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
seg AS (
  SELECT doc_id, (s//12)::BIGINT AS sent_idx,
         coalesce(array_to_string(w[(s+1)::INT:(s+12)::INT], ' '), '') AS sent
  FROM w CROSS JOIN unnest(range(0, len(w), 12)) AS t(s)),
tgt AS (
  SELECT doc_id, sent_idx,
         CASE WHEN sent_idx % 3 = 2
              THEN coalesce(array_to_string(list_reverse(string_split(sent,' '))[1:4], ' '), '')
              ELSE coalesce(array_to_string(list_reverse(string_split(sent,' ')), ' '), '') END AS sent
  FROM seg)
SELECT s.doc_id, s.sent_idx, s.sent AS src_sent, t.sent AS tgt_sent,
       CAST(length(s.sent) AS BIGINT) AS src_chars,
       CAST(length(t.sent) AS BIGINT) AS tgt_chars,
       CAST(CASE WHEN greatest(length(s.sent), length(t.sent)) * 10
                      <= least(length(s.sent), length(t.sent)) * 13 THEN 1 ELSE 0 END AS BIGINT) AS pair_ok
FROM seg s JOIN tgt t USING (doc_id, sent_idx)
"""
got = sorted(map(tuple, con.execute(bt_sql).fetchall()))
texts = con.execute("SELECT doc_id, text FROM documents").fetchall()
exp = []
for i, t in texts:
    words = t.split(' ')
    for k in range(0, len(words), 12):
        idx = k // 12
        src = ' '.join(words[k:k+12])
        rev = list(reversed(words[k:k+12]))
        tg = ' '.join(rev[:4] if idx % 3 == 2 else rev)
        ok = 1 if max(len(src), len(tg)) * 10 <= min(len(src), len(tg)) * 13 else 0
        exp.append((i, idx, src, tg, len(src), len(tg), ok))
exp = sorted(exp)
print("bitext rows:", len(got), "match:", got == exp)
if got != exp:
    for a, b in zip(got, exp):
        if a != b: print("GOT", a); print("EXP", b); break
ok1 = sum(1 for r in exp if r[6] == 1)
print("accepted pairs:", ok1, "of", len(exp))
