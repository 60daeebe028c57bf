import duckdb
con = duckdb.connect()
con.execute("CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.01/documents.parquet'")
sql = """
WITH h AS (
  SELECT doc_id % 8 AS shard, CAST(length(text) AS BIGINT) AS bytes,
         list_reduce(
           list_prepend(14695981039346656037::HUGEINT,
                        [unicode(c)::HUGEINT for c in string_split(text, '')]),
           (h, b) -> ((h - h % 128 + xor((h % 128)::BIGINT, b::BIGINT)::HUGEINT)
                      * 1099511628211::HUGEINT) % (1::HUGEINT << 64)) AS hu
  FROM documents)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(bytes) AS BIGINT) AS bytes,
       bit_xor(CAST(CASE WHEN hu >= (1::HUGEINT << 63) THEN hu - (1::HUGEINT << 64) ELSE hu END AS BIGINT)) AS checksum
FROM h GROUP BY shard
"""
got = sorted(map(tuple, con.execute(sql).fetchall()))
M = (1<<64)-1
def fnv64(s):
    h = 0xcbf29ce484222325
    for b in s.encode(): h ^= b; h = (h * 0x100000001b3) & M
    return h
def signed(u): return u - (1<<64) if u >= (1<<63) else u
from collections import defaultdict
agg = defaultdict(lambda: [0, 0, 0])
for i, t in con.execute("SELECT doc_id, text FROM documents").fetchall():
    a = agg[i % 8]
    a[0] += 1; a[1] += len(t); a[2] ^= fnv64(t)
exp = sorted((s, n, b, signed(x)) for s, (n, b, x) in agg.items())
print("match:", got == exp, got[:2])
