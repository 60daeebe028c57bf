#!/usr/bin/env python3
"""Validate the contrastive_pairs oracle SQL against an independent Python
recompute (CLAUDE.md rule). Usage: contrastive_check.py [sfDir]."""
import math
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
K = 6

ORACLE = """
WITH all_v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         [trunc(x*4096)::BIGINT for x in CAST(embedding AS DOUBLE[])] AS q
  FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]) AS v,
         [trunc(x*4096)::BIGINT for x in CAST(embedding AS DOUBLE[])] AS q
  FROM embeddings),
qs AS (SELECT vec_id AS query_id, v AS qv, q AS qq FROM all_v ORDER BY vec_id LIMIT 5),
p AS (
  SELECT qs.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(qs.qv, e.v) AS rawsim,
         list_sum([qs.qq[d] * e.q[d] for d in range(1, len(e.q)+1)])::HUGEINT AS dot,
         list_sum([qs.qq[d] * qs.qq[d] for d in range(1, len(qs.qq)+1)])::HUGEINT AS na,
         list_sum([e.q[d] * e.q[d] for d in range(1, len(e.q)+1)])::HUGEINT AS nb
  FROM qs, all_v e WHERE e.vec_id <> qs.query_id),
d AS (SELECT *, CASE WHEN dot > 0 AND dot*dot*1000000 >= 999*999*na*nb
                     THEN 1 ELSE 0 END AS isdup FROM p),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rawsim DESC, neighbor_id) AS rn
      FROM d WHERE isdup = 0)
SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank, round(rawsim, 6) AS sim,
       CASE WHEN rn = 1 THEN 'positive' ELSE 'hard_negative' END AS role
FROM r WHERE rn <= 6
UNION ALL
SELECT query_id, neighbor_id, 0, round(rawsim, 6), 'dup' FROM d WHERE isdup = 1
ORDER BY query_id, rank, neighbor_id
"""


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')")
    got = [(int(r[0]), int(r[1]), int(r[2]), float(r[3]), r[4])
           for r in con.execute(ORACLE).fetchall()]

    base = con.execute("SELECT vec_id, embedding FROM embeddings").fetchall()
    allv = [(vid, list(map(float, v))) for vid, v in base]
    allv += [(vid + 1000000, list(map(float, v))) for vid, v in base]
    allv.sort()
    anchors = allv[:5]
    want = []
    for qid, qv in anchors:
        qq = [math.trunc(x * 4096) for x in qv]
        ranked, dups = [], []
        for vid, v in allv:
            if vid == qid:
                continue
            vq = [math.trunc(x * 4096) for x in v]
            dot = sum(a * b for a, b in zip(qq, vq))
            na = sum(a * a for a in qq)
            nb = sum(b * b for b in vq)
            dotv = sum(a * b for a, b in zip(qv, v))
            naf = math.sqrt(sum(a * a for a in qv))
            nbf = math.sqrt(sum(b * b for b in v))
            sim = 0.0 if naf == 0 or nbf == 0 else dotv / (naf * nbf)
            if dot > 0 and dot * dot * 1000000 >= 999 * 999 * na * nb:
                dups.append((vid, sim))
            else:
                ranked.append((vid, sim))
        ranked.sort(key=lambda t: (-t[1], t[0]))
        for vid, sim in dups:
            want.append((qid, vid, 0, round(sim, 6), "dup"))
        for i, (vid, sim) in enumerate(ranked[:K]):
            want.append((qid, vid, i + 1, round(sim, 6),
                         "positive" if i == 0 else "hard_negative"))
    want.sort(key=lambda t: (t[0], t[2], t[1]))

    if got == want:
        ndup = sum(1 for r in want if r[4] == "dup")
        print(f"contrastive oracle OK: {len(want)} rows match ({ndup} dup exclusions)")
    else:
        bad = [(g, w) for g, w in zip(got, want) if g != w]
        print(f"MISMATCH: got {len(got)} want {len(want)}; first diffs: {bad[:3]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
