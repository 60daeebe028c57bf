#!/usr/bin/env python3
"""Pre-wiring validation for the codeswitch_stats / domain_pareto /
hll_cumulative oracles (CLAUDE.md rule: validate oracle SQL against a Python
recompute BEFORE wiring). Run: python3 tools/new_ops_oracle_check.py /root/testdata/sf0.01
"""
import sys, duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")

# ---- shared python replica of TextHash.langIdDetail ------------------------
PROF = {
    'en': {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    'de': {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"},
    'fr': {"le", "la", "et", "les", "des", "un", "une", "est", "pour", "que"},
    'es': {"el", "los", "las", "y", "es", "una", "por", "para", "con", "del"},
}
TRI = {
    'en': {"the", "ing", "ion", "and", "ent"},
    'de': {"sch", "ich", "ein", "cht", "und"},
    'fr': {"ent", "les", "ion", "que", "eur"},
    'es': {"ent", "los", "cio", "ado", "que"},
}

def lang_id(text):
    cps = [ord(c) for c in text]
    if cps:
        cjk = sum(1 for c in cps if 0x4E00 <= c <= 0x9FFF)
        if cjk / len(cps) > 0.2:
            return 'zh'
    toks = text.lower().split()
    if not toks:
        return 'und'
    lt = text.lower()
    tris = [lt[i:i + 3] for i in range(len(lt) - 2)] if len(lt) >= 3 else [lt]
    scores = sorted(
        ((l, 3 * sum(t in PROF[l] for t in toks) + sum(g in TRI[l] for g in tris))
         for l in ('en', 'de', 'es', 'fr')), key=lambda x: (-x[1], x[0]))
    l, n = scores[0]
    return 'und' if n == 0 else l

BANK_LANG = ['en', 'en', 'de', 'fr', 'es', 'zh']

# the lang_id oracle CTE, verbatim from SparkEntry (green in r4), reduced to
# (doc_id, lang)
LANG_CTE = """
cj AS (SELECT doc_id,
         CAST(length(text) AS BIGINT) AS cps,
         CAST(len(list_filter(string_split(text,''), c -> unicode(c) BETWEEN 19968 AND 40959)) AS BIGINT) AS cjk
       FROM documents),
t AS (SELECT doc_id, lower(text) AS lt, string_split(lower(text),' ') AS toks FROM documents),
s AS (SELECT doc_id, toks, [substring(lt, i, 3) for i in range(1, length(lt)-1)] AS tris FROM t),
sc AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(3*len(list_filter(toks, w -> w IN ('the','and','of','to','a','in','is','it','that','for'))) + len(list_filter(tris, g -> g IN ('the','ing','ion','and','ent'))) AS BIGINT) AS n_en,
  CAST(3*len(list_filter(toks, w -> w IN ('der','die','und','das','ist','nicht','ein','mit','zu','den'))) + len(list_filter(tris, g -> g IN ('sch','ich','ein','cht','und'))) AS BIGINT) AS n_de,
  CAST(3*len(list_filter(toks, w -> w IN ('le','la','et','les','des','un','une','est','pour','que'))) + len(list_filter(tris, g -> g IN ('ent','les','ion','que','eur'))) AS BIGINT) AS n_fr,
  CAST(3*len(list_filter(toks, w -> w IN ('el','los','las','y','es','una','por','para','con','del'))) + len(list_filter(tris, g -> g IN ('ent','los','cio','ado','que'))) AS BIGINT) AS n_es
  FROM s),
p0 AS (SELECT sc.doc_id,
  CASE WHEN cj.cps > 0 AND 5*cj.cjk > cj.cps THEN 'zh'
       WHEN greatest(n_de, n_en, n_es, n_fr) = 0 THEN 'und'
       WHEN n_de >= n_en AND n_de >= n_es AND n_de >= n_fr THEN 'de'
       WHEN n_en >= n_es AND n_en >= n_fr THEN 'en'
       WHEN n_es >= n_fr THEN 'es' ELSE 'fr' END AS lang
  FROM sc JOIN cj ON sc.doc_id = cj.doc_id)
"""

CODESWITCH_SQL = f"""WITH {LANG_CTE},
l0 AS (SELECT doc_id, CAST(0 AS BIGINT) AS i, lang FROM p0),
pl0 AS (SELECT doc_id, unnest(range(1, 3 + CAST(doc_id % 3 AS INT))) AS i FROM documents),
pl AS (SELECT doc_id, CAST(i AS BIGINT) AS i,
         CASE (doc_id + 7*i) % 6 WHEN 0 THEN 'en' WHEN 1 THEN 'en' WHEN 2 THEN 'de'
              WHEN 3 THEN 'fr' WHEN 4 THEN 'es' ELSE 'zh' END AS lang
       FROM pl0),
langs AS (SELECT * FROM l0 UNION ALL SELECT * FROM pl),
counts AS (SELECT doc_id, lang, count(*) AS c FROM langs GROUP BY doc_id, lang),
dom AS (SELECT doc_id, lang, c,
          row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, lang) AS rn
        FROM counts),
sw AS (SELECT a.doc_id, sum(CASE WHEN a.lang != b.lang THEN 1 ELSE 0 END) AS s
       FROM langs a JOIN langs b ON a.doc_id = b.doc_id AND b.i = a.i + 1
       GROUP BY a.doc_id),
np AS (SELECT doc_id, count(*) AS n_paras, count(DISTINCT lang) AS n_langs
       FROM langs GROUP BY doc_id)
SELECT np.doc_id, CAST(np.n_paras AS BIGINT) AS n_paras,
       CAST(np.n_langs AS BIGINT) AS n_langs,
       dom.lang AS dominant_lang, CAST(dom.c AS BIGINT) AS dominant_cnt,
       CAST(coalesce(sw.s, 0) AS BIGINT) AS n_switches
FROM np JOIN dom ON np.doc_id = dom.doc_id AND dom.rn = 1
LEFT JOIN sw ON np.doc_id = sw.doc_id
ORDER BY np.doc_id"""


def check_codeswitch():
    sql = {r[0]: r[1:] for r in con.execute(CODESWITCH_SQL).fetchall()}
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    bad = 0
    for doc_id, text in docs:
        langs = [lang_id(text)]
        for i in range(1, 3 + doc_id % 3):
            langs.append(BANK_LANG[(doc_id + 7 * i) % 6])
        counts = {}
        for l in langs:
            counts[l] = counts.get(l, 0) + 1
        dl, dc = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        sw = sum(1 for a, b in zip(langs, langs[1:]) if a != b)
        want = (len(langs), len(counts), dl, dc, sw)
        got = sql.get(doc_id)
        if got != want:
            bad += 1
            if bad <= 5:
                print(f"  codeswitch MISMATCH doc {doc_id}: sql={got} py={want}")
    print(f"codeswitch_stats: {len(docs) - bad}/{len(docs)} rows match")
    return bad == 0


DOMAIN_SQL = """WITH h AS (SELECT doc_id, text,
  CASE doc_id%10
    WHEN 0 THEN 'news' || (doc_id%5) || '.co.uk'
    WHEN 1 THEN 'blog' || (doc_id%7) || '.github.io'
    WHEN 2 THEN 'example.com'
    WHEN 3 THEN CASE WHEN doc_id%9=0 THEN '' ELSE 'corp' || (doc_id%3) || '.com.au' END
    WHEN 4 THEN 'deep' || (doc_id%4) || '.org'
    WHEN 5 THEN 'cdn' || (doc_id%6) || '.net'
    WHEN 6 THEN 'shop' || (doc_id%5) || '.co.jp'
    WHEN 7 THEN '192.168.' || (doc_id%4) || '.10'
    WHEN 8 THEN 'example.zz'
    ELSE 'localhost' END AS domain
  FROM documents),
d AS (SELECT domain, CAST(sum(len(string_split(text,' '))) AS BIGINT) AS n_tokens
      FROM h GROUP BY domain),
r AS (SELECT domain, n_tokens,
        CAST(row_number() OVER (ORDER BY n_tokens DESC, domain) AS BIGINT) AS rnk,
        CAST(sum(n_tokens) OVER (ORDER BY n_tokens DESC, domain
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM d),
t AS (SELECT sum(n_tokens) AS tt FROM d)
SELECT domain, n_tokens, rnk, cum_tokens,
       CAST(cum_tokens * 10000 // tt AS BIGINT) AS cum_share_bp
FROM r, t ORDER BY rnk"""


def plant_domain(doc_id):
    m = doc_id % 10
    if m == 0: return f'news{doc_id%5}.co.uk'
    if m == 1: return f'blog{doc_id%7}.github.io'
    if m == 2: return 'example.com'
    if m == 3: return '' if doc_id % 9 == 0 else f'corp{doc_id%3}.com.au'
    if m == 4: return f'deep{doc_id%4}.org'
    if m == 5: return f'cdn{doc_id%6}.net'
    if m == 6: return f'shop{doc_id%5}.co.jp'
    if m == 7: return f'192.168.{doc_id%4}.10'
    if m == 8: return 'example.zz'
    return 'localhost'


def check_domain():
    sql = con.execute(DOMAIN_SQL).fetchall()
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    agg = {}
    for doc_id, text in docs:
        agg[plant_domain(doc_id)] = agg.get(plant_domain(doc_id), 0) + len(text.split(' '))
    rows = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))
    tt = sum(agg.values())
    cum, want = 0, []
    for i, (dom, n) in enumerate(rows):
        cum += n
        want.append((dom, n, i + 1, cum, cum * 10000 // tt))
    ok = sql == want
    if not ok:
        for a, b in zip(sql, want):
            if a != b:
                print(f"  domain MISMATCH: sql={a} py={b}")
    print(f"domain_pareto: {'OK' if ok else 'MISMATCH'} ({len(sql)} rows, {len(want)} expected)")
    return ok


HLL_SQL = """WITH vals AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(user_id * 1024 + (CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS HUGEINT) AS v
  FROM events),
h1 AS (SELECT event_type, day, (v + 11400714819323198485) % 18446744073709551616 AS z FROM vals),
h2 AS (SELECT event_type, day, xor(z, z >> 30) AS x FROM h1),
h3 AS (SELECT event_type, day,
         ((x % 4294967296) * 484763065
          + (((x % 4294967296) * 3210233709 + (x // 4294967296) * 484763065) % 4294967296) * 4294967296)
         % 18446744073709551616 AS z
       FROM h2),
h4 AS (SELECT event_type, day, xor(z, z >> 27) AS x FROM h3),
h5 AS (SELECT event_type, day,
         ((x % 4294967296) * 321982955
          + (((x % 4294967296) * 2496678331 + (x // 4294967296) * 321982955) % 4294967296) * 4294967296)
         % 18446744073709551616 AS z
       FROM h4),
hh AS (SELECT event_type, day, xor(z, z >> 31) AS h FROM h5),
b AS (SELECT event_type, day, CAST(h // 288230376151711744 AS BIGINT) AS idx,
             h % 288230376151711744 AS rest FROM hh),
r AS (SELECT event_type, day, idx,
             max(CASE WHEN rest = 0 THEN 59 ELSE 58 - len(bin(rest)) + 1 END) AS rho
      FROM b GROUP BY event_type, day, idx),
grid AS (SELECT DISTINCT event_type, day FROM vals),
gi AS (SELECT g.event_type, g.day, x.i AS idx
       FROM grid g, UNNEST(generate_series(0, 63)) x(i)),
regs AS (SELECT gi.event_type, gi.day, gi.idx, coalesce(max(r.rho), 0) AS rho
         FROM gi LEFT JOIN r ON r.event_type = gi.event_type AND r.idx = gi.idx
                            AND r.day <= gi.day
         GROUP BY gi.event_type, gi.day, gi.idx),
est AS (SELECT event_type, day, sum(CAST(1 AS HUGEINT) << (59 - rho)) AS z2
        FROM regs GROUP BY event_type, day),
estv AS (SELECT event_type, day,
           CAST((709343 * CAST(4096 AS HUGEINT) * 576460752303423488) // (1000000 * z2) AS BIGINT) AS e
         FROM est),
firsts AS (SELECT event_type, v, min(day) AS fday FROM vals GROUP BY event_type, v),
exact AS (SELECT g.event_type, g.day, count(*) AS ex FROM grid g
          JOIN firsts f ON f.event_type = g.event_type AND f.fday <= g.day
          GROUP BY g.event_type, g.day)
SELECT estv.event_type, CAST(estv.day AS BIGINT) AS day, e AS cum_distinct_est,
       CAST(ex AS BIGINT) AS cum_distinct_exact,
       CAST(abs(e - ex) * 10000 // ex AS BIGINT) AS err_bp
FROM estv JOIN exact USING (event_type, day)
ORDER BY event_type, day"""

MASK = (1 << 64) - 1


def splitmix64(x):
    z = (x + 0x9E3779B97F4A7C15) & MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
    return z ^ (z >> 31)


def check_hll():
    sql = con.execute(HLL_SQL).fetchall()
    ev = con.execute(
        "SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day, user_id FROM events"
    ).fetchall()
    # per (type, day): register maxima and first-seen values
    regs, seen, days = {}, {}, {}
    for t, day, uid in ev:
        v = (uid * 1024 + day) & MASK
        h = splitmix64(v)
        idx, rest = h >> 58, h & ((1 << 58) - 1)
        rho = 59 if rest == 0 else 58 - rest.bit_length() + 1
        key = (t, day, idx)
        if regs.get(key, 0) < rho:
            regs[key] = rho
        seen.setdefault((t, v), day)
        if seen[(t, v)] > day:
            seen[(t, v)] = day
        days.setdefault(t, set()).add(day)
    want = []
    for t in sorted(days):
        for d in sorted(days[t]):
            z2 = 0
            for idx in range(64):
                rho = max((r for (tt, dd, ii), r in regs.items()
                           if tt == t and ii == idx and dd <= d), default=0)
                z2 += 1 << (59 - rho)
            e = (709343 * 4096 * (1 << 59)) // (1000000 * z2)
            ex = sum(1 for (tt, _), fd in seen.items() if tt == t and fd <= d)
            want.append((t, d, e, ex, abs(e - ex) * 10000 // ex))
    ok = sql == want
    if not ok:
        for a, b in zip(sql, want):
            if a != b:
                print(f"  hll MISMATCH: sql={a} py={b}")
    print(f"hll_cumulative: {'OK' if ok else 'MISMATCH'} ({len(sql)} rows, {len(want)} expected)")
    return ok


ok = check_domain() & check_codeswitch() & check_hll()
sys.exit(0 if ok else 1)
