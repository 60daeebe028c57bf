import duckdb
M = (1<<64)-1
def fnv64(s):
    h = 0xcbf29ce484222325
    for b in s.encode(): h ^= b; h = (h * 0x100000001b3) & M
    return h
def sm64(x):
    x = (x + 0x9e3779b97f4a7c15) & M
    x = ((x ^ (x >> 30)) * 0xbf58476d1ce4e5b9) & M
    x = ((x ^ (x >> 27)) * 0x94d049bb133111eb) & M
    return x ^ (x >> 31)
def signed(u): return u - (1<<64) if u >= (1<<63) else u
def shingles(t):
    toks = t.split(' ')
    if len(toks) < 3: return {fnv64(' '.join(toks))}
    return {fnv64(' '.join(toks[i:i+3])) for i in range(len(toks)-2)}
PERMS, BANDS, ROWS = 64, 16, 4
pa = [sm64(0x5eed0001 + i) | 1 for i in range(PERMS)]
pb = [sm64(0x5eed1001 + i) for i in range(PERMS)]
def sig(sh):
    out = [None]*PERMS
    for s in sh:
        for i in range(PERMS):
            h = signed((pa[i]*s + pb[i]) & M)
            if out[i] is None or h < out[i]: out[i] = h
    return out
def bandkeys(sg):
    ks = set()
    for b in range(BANDS):
        h = 0xcbf29ce484222325 ^ b
        for r in range(ROWS):
            h = ((h ^ (sg[b*ROWS+r] & M)) * 0x100000001b3) & M
        ks.add(h)
    return ks

con = duckdb.connect()
rows = con.execute("SELECT doc_id, text FROM '/root/testdata/sf0.01/documents.parquet' ORDER BY doc_id").fetchall()
base = {i: t for i, t in rows}
inc = {}
for i, t in rows:
    k = i + 2000000
    if i % 3 == 0: inc[k] = t
    elif i % 3 == 1: inc[k] = t[t.index(' ')+1:] if ' ' in t else t
    else: inc[k] = ' '.join(f"f{i}w{w}" for w in range(1, 21))
shb = {i: shingles(t) for i, t in base.items()}
shi = {i: shingles(t) for i, t in inc.items()}
kb = {i: bandkeys(sig(sorted(s))) for i, s in shb.items()}
ki = {i: bandkeys(sig(sorted(s))) for i, s in shi.items()}
missed, hits = [], 0
for a, sa in shi.items():
    for b, sb in shb.items():
        inter = len(sa & sb); un = len(sa) + len(sb) - inter
        if inter*5 >= un*4:
            hits += 1
            if not (ki[a] & kb[b]): missed.append((a, b, inter, un))
ncand = sum(1 for a in shi for b in shb if ki[a] & kb[b])
print("qualifying bipartite pairs:", hits, "missed by LSH:", missed[:5], "| candidates:", ncand)

# ---- oracle SQL validation ----
sql = """
WITH binc AS (
  SELECT doc_id + 2000000 AS doc_id,
         CASE WHEN doc_id%3=0 THEN text
              WHEN doc_id%3=1 THEN substring(text, instr(text,' ')+1)
              ELSE array_to_string(['f'||doc_id||'w'||w for w in range(1,21)], ' ') END AS text
  FROM documents),
shb AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
shi AS (SELECT doc_id, string_split(text,' ') AS w FROM binc),
sb AS (SELECT doc_id, CASE WHEN len(w) < 3 THEN [array_to_string(w,' ')]
                           ELSE list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) END AS s
       FROM shb),
si AS (SELECT doc_id, CASE WHEN len(w) < 3 THEN [array_to_string(w,' ')]
                           ELSE list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) END AS s
       FROM shi),
q AS (SELECT i.doc_id AS a, b.doc_id AS b
      FROM si i, sb b
      WHERE 5*len(list_intersect(i.s, b.s)) >= 4*(len(i.s)+len(b.s)-len(list_intersect(i.s, b.s))))
SELECT i.doc_id,
       CAST(CASE WHEN min(q.b) IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_neardup,
       coalesce(min(q.b), -1) AS base_match
FROM si i LEFT JOIN q ON i.doc_id = q.a
GROUP BY i.doc_id
"""
con2 = duckdb.connect()
con2.execute("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.01/documents.parquet'")
got = sorted(map(tuple, con2.execute(sql).fetchall()))
# python recompute from the earlier structures
exp = []
for a, sa in shi.items():
    ms = [b for b, sb2 in shb.items()
          if 5*len(sa & sb2) >= 4*(len(sa)+len(sb2)-len(sa & sb2))]
    exp.append((a, 1 if ms else 0, min(ms) if ms else -1))
exp = sorted(exp)
print("oracle rows:", len(got), "match:", got == exp)
print("flagged:", sum(1 for r in exp if r[1]==1), "of", len(exp))
