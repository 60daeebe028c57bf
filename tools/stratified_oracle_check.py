import duckdb
con = duckdb.connect()
con.execute("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.01/documents.parquet'")
FNV = """
list_reduce(
  list_prepend(14695981039346656037::HUGEINT,
               [unicode(c)::HUGEINT for c in string_split('strat:' || doc_id, '')]),
  (h, b) -> ((h - h % 128 + xor((h % 128)::BIGINT, b::BIGINT)::HUGEINT)
             * 1099511628211::HUGEINT) % (1::HUGEINT << 64))
"""
sql = f"""
WITH k AS (
  SELECT doc_id,
         lang || '|' || least(length(text)//256, 3) AS stratum,
         ({FNV}) % (1::HUGEINT << 32) AS priority
  FROM documents),
c AS (SELECT stratum, count(*)::BIGINT AS n_stratum FROM k GROUP BY stratum),
q AS (SELECT stratum, n_stratum,
             (100*n_stratum)//(sum(n_stratum) OVER ()) AS base,
             (100*n_stratum)%(sum(n_stratum) OVER ()) AS rem
      FROM c),
q2 AS (SELECT stratum, n_stratum, base, rem,
              100 - sum(base) OVER () AS leftover,
              row_number() OVER (ORDER BY rem DESC, stratum) AS seat_rank
       FROM q),
q3 AS (SELECT stratum, n_stratum,
              least(base + CASE WHEN seat_rank <= leftover THEN 1 ELSE 0 END, n_stratum) AS quota
       FROM q2),
r AS (SELECT doc_id, stratum, priority,
             row_number() OVER (PARTITION BY stratum ORDER BY priority, doc_id) AS rnk
      FROM k)
SELECT r.doc_id, r.stratum, CAST(r.rnk AS BIGINT) AS rnk,
       CAST(q3.quota AS BIGINT) AS quota, q3.n_stratum
FROM r JOIN q3 USING (stratum) WHERE r.rnk <= q3.quota
"""
got = sorted(map(tuple, con.execute(sql).fetchall()))

# independent Python recompute
M = (1<<64)-1
def fnv64(s):
    h = 0xcbf29ce484222325
    for b in s.encode():
        h ^= b; h = (h * 0x100000001b3) & M
    return h
rows = con.execute("SELECT doc_id, text, lang FROM documents").fetchall()
from collections import defaultdict
strata = defaultdict(list)
for i, t, lang in rows:
    st = f"{lang}|{min(len(t)//256, 3)}"
    pri = fnv64(f"strat:{i}") % (1<<32)
    strata[st].append((pri, i))
N = len(rows); B = 100
base = {s: B*len(v)//N for s, v in strata.items()}
rem = {s: B*len(v) % N for s, v in strata.items()}
L = B - sum(base.values())
order = sorted(strata, key=lambda s: (-rem[s], s))
quota = {}
for idx, s in enumerate(order):
    q = base[s] + (1 if idx < L else 0)
    quota[s] = min(q, len(strata[s]))
exp = []
for s, v in strata.items():
    for rnk, (pri, i) in enumerate(sorted(v), 1):
        if rnk <= quota[s]:
            exp.append((i, s, rnk, quota[s], len(v)))
exp = sorted(exp)
print("rows:", len(got), "match:", got == exp, "| budget check: selected =", len(exp))
print("strata:", {s: (len(v), quota[s]) for s, v in sorted(strata.items())})
