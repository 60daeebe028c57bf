#!/usr/bin/env python3
"""Validate the containment_dedup oracle SQL against an independent Python
recompute (CLAUDE.md rule). Usage: containment_check.py [sfDir]."""
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
W, K, MAXB = 5, 6, 64
MASK = (1 << 63) - 1

ORACLE = """
WITH base AS (SELECT doc_id, text FROM documents),
p AS (SELECT b.doc_id,
        CASE WHEN b.doc_id%9=2 AND pv.text IS NOT NULL THEN pv.text || ' ' || b.text ELSE b.text END AS text
      FROM base b LEFT JOIN base pv ON pv.doc_id = b.doc_id - 1),
w AS (SELECT doc_id, string_split(text,' ') AS ws FROM p),
gt AS (SELECT doc_id, list_distinct([array_to_string(ws[i:i+4],' ') for i in range(1, len(ws)-3)]) AS grams
       FROM w WHERE len(ws) >= 5),
g AS (SELECT doc_id, list_sort(list_distinct(
        [ (list_reduce(list_prepend(14695981039346656037::HUGEINT,
             [unicode(c)::HUGEINT for c in string_split(x,'')]),
             (h,b) -> ((h - h%128 + xor((h%128)::BIGINT, b::BIGINT)::HUGEINT) * 1099511628211::HUGEINT) % (1::HUGEINT<<64))
            % (1::HUGEINT<<63))::BIGINT
          for x in grams ])) AS gh
      FROM gt),
ge AS (SELECT doc_id, unnest(gh) AS s FROM g),
sk AS (SELECT doc_id, unnest(gh[1:6]) AS s FROM g),
ok AS (SELECT s FROM ge GROUP BY s HAVING count(*) <= 64),
cand AS (SELECT DISTINCT least(x.doc_id, y.doc_id) AS a, greatest(x.doc_id, y.doc_id) AS b
         FROM sk x JOIN ok USING (s) JOIN ge y ON x.s = y.s AND x.doc_id <> y.doc_id),
v AS (SELECT c.a, c.b,
        CAST(len(list_intersect(ga.gh, gb.gh)) AS BIGINT) AS inter,
        CAST(len(ga.gh) AS BIGINT) AS na, CAST(len(gb.gh) AS BIGINT) AS nb
      FROM cand c JOIN g ga ON ga.doc_id=c.a JOIN g gb ON gb.doc_id=c.b)
SELECT a, b, inter, na, nb,
       (inter*10000)//na AS cont_a, (inter*10000)//nb AS cont_b,
       CAST(CASE WHEN inter*10 >= na*9 OR inter*10 >= nb*9 THEN 1 ELSE 0 END AS BIGINT) AS contained
FROM v ORDER BY a, b
"""


def fnv(s):
    h = 0xcbf29ce484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001b3) % (1 << 64)
    return h & MASK


def main():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    got = [tuple(int(x) for x in r) for r in con.execute(ORACLE).fetchall()]

    rows = dict(con.execute("SELECT doc_id, text FROM documents").fetchall())
    planted = {}
    for did, text in rows.items():
        if did % 9 == 2 and (did - 1) in rows:
            planted[did] = rows[did - 1] + " " + text
        else:
            planted[did] = text
    gh = {}
    for did, text in planted.items():
        ws = text.split(" ")
        if len(ws) < W:
            continue
        keys = sorted({fnv(" ".join(ws[i:i + W])) for i in range(len(ws) - W + 1)})
        if keys:
            gh[did] = keys
    full = {}
    for did, keys in gh.items():
        for s in keys:
            full.setdefault(s, []).append(did)
    cand = set()
    for did, keys in gh.items():
        for s in keys[:K]:
            dids = full[s]
            if len(dids) > MAXB:
                continue
            for other in dids:
                if other != did:
                    cand.add((min(did, other), max(did, other)))
    want = []
    for a, b in sorted(cand):
        sa, sb = set(gh[a]), set(gh[b])
        inter = len(sa & sb)
        na, nb = len(sa), len(sb)
        want.append((a, b, inter, na, nb, inter * 10000 // na, inter * 10000 // nb,
                     1 if (inter * 10 >= na * 9 or inter * 10 >= nb * 9) else 0))

    if got == want:
        planted_pairs = sum(1 for (a, b, *_rest) in want if b - a == 1 and b % 9 == 2)
        contained = sum(r[7] for r in want)
        print(f"containment oracle OK: {len(want)} candidate pairs match; "
              f"{contained} contained; {planted_pairs} planted-quote pairs surfaced")
    else:
        onlyg = [r for r in got if r not in set(want)][:3]
        onlyw = [r for r in want if r not in set(got)][:3]
        print(f"MISMATCH: got {len(got)} want {len(want)}; got-only {onlyg}; want-only {onlyw}")
        sys.exit(1)


if __name__ == "__main__":
    main()
