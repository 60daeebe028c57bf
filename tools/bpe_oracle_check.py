#!/usr/bin/env python3
"""Independent BPE-training recompute — the validation harness for the
`bpe_train` query's pinned-VALUES oracle (the ann_oracle_check.py pattern:
iterative ops whose state depends on per-round argmax are not expressible as
one SQL statement, so the oracle pins the independently-recomputed result and
THIS script is the derivation).

Semantics (shared verbatim with graft.textops.BpeTrain):
  - word frequencies over whitespace-split corpus words;
  - initial tokenization: one token per character;
  - each round: count adjacent token pairs weighted by word frequency —
    EVERY adjacent position counts (overlaps included: "aaa" has (a,a)
    twice), the standard BPE pair count;
  - merge = max count, ties broken by (left ASC, right ASC);
  - apply merge to every word's token list by a greedy-left fold (a merged
    token cannot re-merge with the following token in the same round).

Usage: python3 tools/bpe_oracle_check.py <sfDir> [rounds]
Prints one line per merge: rank|left|right|freq  (and the VALUES oracle).
"""
import sys
from collections import Counter
import duckdb


def fold_merge(tokens, a, b):
    out = []
    i = 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == a and tokens[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def pair_counts(vocab):
    c = Counter()
    for toks, f in vocab:
        i = 0
        while i + 1 < len(toks):
            c[(toks[i], toks[i + 1])] += f
            i += 1
    return c


def train(sf_dir, rounds):
    con = duckdb.connect()
    words = con.execute(
        "SELECT w, count(*) FROM (SELECT unnest(string_split(text,' ')) AS w "
        f"FROM read_parquet('{sf_dir}/documents.parquet')) GROUP BY w"
    ).fetchall()
    vocab = [([ch for ch in w], f) for w, f in words if w]
    merges = []
    for r in range(rounds):
        pc = pair_counts(vocab)
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), f = best
        merges.append((r + 1, a, b, f))
        vocab = [(fold_merge(t, a, b), fr) for t, fr in vocab]
    return merges


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    merges = train(sf, rounds)
    for m in merges:
        print("%d|%s|%s|%d" % m)
    rows = ",\n        |  ".join(
        "(%d, '%s', '%s', %d)" % m for m in merges)
    print("-- VALUES oracle:")
    print("SELECT * FROM (VALUES\n        |  " + rows +
          ") t(rank, left_tok, right_tok, freq)")
