#!/usr/bin/env python3
"""Pre-wiring validation for the cdc_chunks / cdc_shift_dedup oracles
(CLAUDE.md rule: validate oracle SQL against a Python recompute BEFORE
wiring). Run: python3 tools/cdc_check.py /root/testdata/sf0.01
"""
import sys, duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")

MASK = (1 << 64) - 1
W, CMASK, FIXED = 4, 7, 8
WEIGHTS = [3, 5, 7, 11]
OFF = 1000000

# FNV-1a over chars (ASCII corpus — byte == codepoint; the doc_fingerprint
# oracle precedent), as a DuckDB lambda fragment applied to a string column S
def FNV(S):
    return ("list_reduce(list_prepend(14695981039346656037::HUGEINT, "
            f"[unicode(c)::HUGEINT for c in string_split({S},'')]), "
            "(h,b) -> ((h - h%128 + xor((h%128)::BIGINT, b::BIGINT)::HUGEINT) "
            "* 1099511628211::HUGEINT) % (1::HUGEINT << 64))")

# shared CDC chunking machinery over a (doc_id, text) relation named d
CHUNK_CTES = f"""
tk AS (SELECT doc_id, string_split(text, ' ') AS ws FROM d),
th AS (SELECT doc_id, ws, [{FNV('t')} for t in ws] AS hs FROM tk),
bd AS (SELECT doc_id, ws, len(ws) AS n,
         [i for i in range(4, len(ws))
          if (hs[i-3]*3 + hs[i-2]*5 + hs[i-1]*7 + hs[i]*11) % 8 = 0] AS bs
       FROM th),
ck AS (SELECT doc_id, n, ws,
         list_prepend(1, [b + 1 for b in bs]) AS ss,
         list_append(bs, n) AS es
       FROM bd),
cr AS (SELECT doc_id, i - 1 AS cidx, ss[i] AS s, es[i] AS e,
         array_to_string(ws[ss[i]:es[i]], ' ') AS cs
       FROM ck, UNNEST(generate_series(1, len(ss))) t(i)),
chash AS (SELECT doc_id, cidx, s, e, {FNV('cs')} AS h FROM cr)
"""

CHUNKS_SQL = f"""WITH d AS (SELECT doc_id, text FROM documents),
{CHUNK_CTES}
SELECT doc_id, CAST(cidx AS BIGINT) AS chunk_idx, CAST(s - 1 AS BIGINT) AS start_tok,
       CAST(e - s + 1 AS BIGINT) AS n_tokens,
       CAST(CASE WHEN h >= (1::HUGEINT << 63) THEN h - (1::HUGEINT << 64) ELSE h END AS BIGINT) AS chunk_hash
FROM chash ORDER BY doc_id, chunk_idx"""

SHIFT_SQL = f"""WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {OFF}, 'banner' || (doc_id % 5) || ' ' || text FROM documents),
{CHUNK_CTES},
fx AS (SELECT doc_id, {FNV("array_to_string(ws[(i*8+1):least((i+1)*8, len(ws))], ' ')")} AS h
       FROM tk, UNNEST(generate_series(0, (len(ws) - 1) // 8)) t(i)),
cs AS (SELECT DISTINCT doc_id % {OFF} AS base_id,
              CASE WHEN doc_id >= {OFF} THEN 1 ELSE 0 END AS it, h FROM chash),
ca AS (SELECT base_id, h, max(it) AS mt, min(it) AS ms FROM cs GROUP BY base_id, h),
cdc AS (SELECT base_id, CAST(sum(mt) AS BIGINT) AS n_cdc,
               CAST(sum(CASE WHEN mt=1 AND ms=0 THEN 1 ELSE 0 END) AS BIGINT) AS shared_cdc
        FROM ca GROUP BY base_id),
fs AS (SELECT DISTINCT doc_id % {OFF} AS base_id,
              CASE WHEN doc_id >= {OFF} THEN 1 ELSE 0 END AS it, h FROM fx),
fa AS (SELECT base_id, h, max(it) AS mt, min(it) AS ms FROM fs GROUP BY base_id, h),
fxd AS (SELECT base_id, CAST(sum(mt) AS BIGINT) AS n_fixed,
               CAST(sum(CASE WHEN mt=1 AND ms=0 THEN 1 ELSE 0 END) AS BIGINT) AS shared_fixed
        FROM fa GROUP BY base_id)
SELECT cdc.base_id AS doc_id, n_cdc, shared_cdc,
       CAST(shared_cdc * 10000 // n_cdc AS BIGINT) AS cdc_share_bp,
       n_fixed, shared_fixed,
       CAST(shared_fixed * 10000 // n_fixed AS BIGINT) AS fixed_share_bp
FROM cdc JOIN fxd ON cdc.base_id = fxd.base_id
ORDER BY doc_id"""


def fnv(s):
    h = 0xcbf29ce484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001b3) & MASK
    return h


def py_chunks(text):
    ws = text.split(" ")
    hs = [fnv(t) for t in ws]
    bs = [i for i in range(W - 1, len(ws) - 1)
          if sum(hs[i - W + 1 + j] * WEIGHTS[j] for j in range(W)) & CMASK == 0]
    starts = [0] + [b + 1 for b in bs]
    ends = bs + [len(ws) - 1]
    return [(s, e - s + 1, " ".join(ws[s:e + 1])) for s, e in zip(starts, ends)]


def signed(h):
    return h - (1 << 64) if h >= (1 << 63) else h


def check_chunks():
    sql = con.execute(CHUNKS_SQL).fetchall()
    docs = con.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
    want = []
    for doc_id, text in docs:
        for ci, (s, n, cs) in enumerate(py_chunks(text)):
            want.append((doc_id, ci, s, n, signed(fnv(cs))))
    ok = sql == want
    if not ok:
        for a, b in zip(sql, want):
            if a != b:
                print(f"  chunks MISMATCH: sql={a} py={b}")
                break
    print(f"cdc_chunks: {'OK' if ok else 'MISMATCH'} ({len(sql)} rows, {len(want)} expected)")
    # sanity: multi-chunk docs exist (boundary rule actually fires)
    multi = len(set(r[0] for r in want if r[1] > 0))
    print(f"  multi-chunk docs: {multi}/{len(docs)}")
    return ok


def check_shift():
    sql = con.execute(SHIFT_SQL).fetchall()
    docs = con.execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
    want = []
    for doc_id, text in docs:
        twin = f"banner{doc_id % 5} {text}"
        oc = {fnv(c[2]) for c in py_chunks(text)}
        tc = {fnv(c[2]) for c in py_chunks(twin)}
        wso, wst = text.split(" "), twin.split(" ")
        of = {fnv(" ".join(wso[i:i + FIXED])) for i in range(0, len(wso), FIXED)}
        tf = {fnv(" ".join(wst[i:i + FIXED])) for i in range(0, len(wst), FIXED)}
        want.append((doc_id, len(tc), len(tc & oc), len(tc & oc) * 10000 // len(tc),
                     len(tf), len(tf & of), len(tf & of) * 10000 // len(tf)))
    ok = sql == want
    if not ok:
        for a, b in zip(sql, want):
            if a != b:
                print(f"  shift MISMATCH: sql={a} py={b}")
                break
    print(f"cdc_shift_dedup: {'OK' if ok else 'MISMATCH'} ({len(sql)} rows, {len(want)} expected)")
    n = len(want)
    cdc_med = sorted(r[3] for r in want)[n // 2]
    fix_med = sorted(r[6] for r in want)[n // 2]
    print(f"  median share bp: cdc={cdc_med} fixed={fix_med} (expect cdc >> fixed)")
    return ok


ok = check_chunks() & check_shift()
sys.exit(0 if ok else 1)
