#!/usr/bin/env python3
"""Validate the bm25_topk oracle SQL against an independent Python recompute
(CLAUDE.md rule: python-validate every new oracle BEFORE wiring it in).
Usage: bm25_check.py [sfDir]."""
import sys
from collections import Counter

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
K = 10

ORACLE = """
WITH t AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM t GROUP BY 1, 2),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tf GROUP BY 1),
tot AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS a FROM dl),
q AS (
  SELECT DISTINCT (doc_id - 3) // 7 AS q_id,
         unnest(string_split(lower(text), ' ')[1:3]) AS term
  FROM documents WHERE doc_id % 7 = 3 AND doc_id <= 31),
sc AS (
  SELECT q.q_id, tf.doc_id,
    sum((length(bin(n // df)) * tf * 2200 * 4096)
        // ((tf * 4096 + (1200 * (250 * 4096 + 750 * ((dl * 4096) // (a // n)))) // 1000000) * 1000)
       )::BIGINT AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN tot
       JOIN q USING (term)
  GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rn
      FROM sc)
SELECT CAST(q_id AS BIGINT) AS q_id, CAST(rn AS BIGINT) AS rnk, doc_id, score
FROM r WHERE rn <= 10 ORDER BY q_id, rnk
"""


def blen(x):
    return x.bit_length()


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    got = con.execute(ORACLE).fetchall()

    docs = con.execute("SELECT doc_id, lower(text) FROM documents").fetchall()
    tf = {}
    for did, text in docs:
        tf[did] = Counter(text.split(" "))
    df = Counter()
    for did, c in tf.items():
        for term in c:
            df[term] += 1
    dl = {did: sum(c.values()) for did, c in tf.items()}
    n, a = len(dl), sum(dl.values())
    avgdl = a // n
    queries = {}
    for did, text in dict(docs).items():
        if did % 7 == 3 and did <= 31:
            queries[(did - 3) // 7] = sorted(set(text.split(" ")[:3]))
    want = []
    for qid in sorted(queries):
        scores = {}
        for did, c in tf.items():
            s = 0
            hit = False
            for term in queries[qid]:
                t = c.get(term, 0)
                if t == 0:
                    continue
                hit = True
                k_fp = (1200 * (250 * 4096 + 750 * ((dl[did] * 4096) // avgdl))) // 1000000
                s += (blen(n // df[term]) * t * 2200 * 4096) // ((t * 4096 + k_fp) * 1000)
            if hit:
                scores[did] = s
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
        for i, (did, s) in enumerate(top):
            want.append((qid, i + 1, did, s))

    got_t = [tuple(int(x) for x in r) for r in got]
    if got_t == want:
        print(f"bm25 oracle OK: {len(want)}/{len(want)} rows match the Python recompute")
    else:
        bad = [(g, w) for g, w in zip(got_t, want) if g != w]
        print(f"MISMATCH: {len(bad)} rows differ; first: {bad[:3]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
