"""Pre-wiring validation for the cluster_canonical oracle (CLAUDE.md rule):
recompute near-dup clusters (trigram-shingle Jaccard >= 0.8 graph, CC by min
label) + per-cluster argmax canonical election in plain Python and diff
against the DuckDB oracle SQL, at both test sfs.

Usage: python3 tools/canonical_oracle_check.py [sf_dir ...]
"""
import sys
from itertools import combinations

import duckdb

ORACLE = """
WITH RECURSIVE
planted AS (
  SELECT doc_id, text FROM '{sf}/documents.parquet'
  UNION ALL
  SELECT doc_id + 1000000, substring(text, instr(text, ' ') + 1) FROM '{sf}/documents.parquet'),
d AS (SELECT doc_id, string_split(text,' ') AS w FROM planted),
sh AS (SELECT doc_id,
              CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                   ELSE list_distinct([array_to_string(w[i:i+2],' ') for i in range(1, len(w)-1)]) END AS s
       FROM d),
pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM sh x, sh y
  WHERE x.doc_id < y.doc_id
    AND 5*len(list_intersect(x.s, y.s)) >= 4*(len(x.s) + len(y.s) - len(list_intersect(x.s, y.s)))),
edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
reach(u, r) AS (
  SELECT doc_id, doc_id FROM planted
  UNION
  SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.u),
c AS (SELECT u AS doc_id, min(r) AS cluster_id FROM reach GROUP BY u),
q AS (SELECT doc_id,
             CAST(len(list_filter(string_split(text,' '), w -> w IN ('the','a'))) * 1000000
                  // len(string_split(text,' ')) AS BIGINT) AS score
      FROM planted),
j AS (SELECT c.cluster_id, c.doc_id, q.score FROM c JOIN q USING (doc_id)),
r AS (SELECT cluster_id, doc_id, score,
             row_number() OVER (PARTITION BY cluster_id ORDER BY score DESC, doc_id ASC) AS rn
      FROM j),
n AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members FROM j GROUP BY 1)
SELECT r.cluster_id, n.n_members, r.doc_id AS rep_doc_id, r.score AS rep_score
FROM r JOIN n USING (cluster_id) WHERE rn = 1 ORDER BY cluster_id
"""


def shingles(ws):
    if len(ws) < 3:
        return {" ".join(ws)}
    return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}


def python_recompute(sf, con):
    rows = con.sql(f"SELECT doc_id, text FROM '{sf}/documents.parquet'").fetchall()
    docs = {}
    for i, t in rows:
        docs[i] = t
        docs[i + 1000000] = t.split(" ", 1)[1] if " " in t else ""
    sh = {i: shingles(t.split(" ")) for i, t in docs.items()}
    parent = {i: i for i in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in combinations(sorted(docs), 2):
        inter = len(sh[a] & sh[b])
        union = len(sh[a]) + len(sh[b]) - inter
        if 5 * inter >= 4 * union:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for i in docs:
        clusters.setdefault(find(i), []).append(i)
    out = []
    for cid in sorted(clusters):
        members = clusters[cid]
        scored = []
        for i in members:
            ws = docs[i].split(" ")
            score = sum(1 for w in ws if w in ("the", "a")) * 1000000 // len(ws)
            scored.append((score, i))
        best = max(scored, key=lambda t: (t[0], -t[1]))
        out.append((cid, len(members), best[1], best[0]))
    return out


def main():
    sfs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    con = duckdb.connect()
    ok = True
    for sf in sfs:
        py = python_recompute(sf, con)
        db = [tuple(r) for r in con.sql(ORACLE.format(sf=sf)).fetchall()]
        match = py == db
        ok &= match
        nontriv = sum(1 for r in py if r[1] > 1)
        diverge = sum(1 for r in py if r[1] > 1 and r[2] != r[0])
        print(f"{sf}: clusters={len(py)} nontrivial={nontriv} rep!=min_id={diverge} -> "
              f"{'OK' if match else 'MISMATCH'}")
        if not match:
            for p, d in zip(py, db):
                if p != d:
                    print("  first diff:", p, "vs", d)
                    break
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
