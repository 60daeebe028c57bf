import duckdb
M = (1<<64)-1
def fnv64(s):
    h = 0xcbf29ce484222325
    for b in s.encode('utf-8'):
        h ^= b
        h = (h * 0x100000001b3) & M
    return h
def sm64(x):
    x = (x + 0x9e3779b97f4a7c15) & M
    x = ((x ^ (x >> 30)) * 0xbf58476d1ce4e5b9) & M
    x = ((x ^ (x >> 27)) * 0x94d049bb133111eb) & M
    return x ^ (x >> 31)
def signed(u): return u - (1<<64) if u >= (1<<63) else u
def shingles(t):
    toks = t.split()
    if len(toks) < 3: return {fnv64(' '.join(toks))}
    return {fnv64(' '.join(toks[i:i+3])) for i in range(len(toks)-2)}
BINS, BANDS, ROWS = 32, 16, 2
def oph(sh):
    sig = [None]*BINS
    for s in sh:
        h = signed(sm64(s))
        b = h % BINS  # Python % on signed == floorMod
        if sig[b] is None or h < sig[b]: sig[b] = h
    out = list(sig)
    for b in range(BINS):
        if sig[b] is None:
            d = 1
            while sig[(b+d) % BINS] is None: d += 1
            out[b] = signed((sig[(b+d)%BINS] + 0x9e3779b97f4a7c15*d) & M)
    return out
def bandkeys(sig):
    ks = []
    for b in range(BANDS):
        h = 0xcbf29ce484222325 ^ b
        for r in range(ROWS):
            h = (h ^ (sig[b*ROWS+r] & M))
            h = (h * 0x100000001b3) & M
        ks.append(h)
    return set(ks)

con = duckdb.connect()
rows = con.execute("SELECT doc_id, text FROM '/root/testdata/sf0.01/documents.parquet' ORDER BY doc_id").fetchall()
docs = {i: t for i, t in rows}
for i, t in rows:
    docs[i + 1000000] = t[t.index(' ')+1:] if ' ' in t else ''
# distinct-text reps
rep = {}
for i in sorted(docs):
    rep.setdefault(docs[i], i)
reps = {i: t for t, i in rep.items()}
sh = {i: shingles(t) for i, t in reps.items()}
keys = {i: bandkeys(oph(sorted(sh[i]))) for i in reps}
ids = sorted(reps)
exact, cand, missed = 0, 0, []
nb = 0
for x in range(len(ids)):
    for y in range(x+1, len(ids)):
        a, b = ids[x], ids[y]
        inter = len(sh[a] & sh[b]); un = len(sh[a]) + len(sh[b]) - inter
        is_dup = inter*5 >= un*4
        shared = len(keys[a] & keys[b]) > 0
        if shared: nb += 1
        if is_dup:
            exact += 1
            if shared: cand += 1
            else: missed.append((a, b, inter, un))
print("reps:", len(ids), "exact pairs:", exact, "caught:", cand, "missed:", missed[:5])
print("total candidate pairs (incl. false):", nb)
# empty-bin stats
import statistics
empt = [sum(1 for v in oph(sorted(s)) if False) for s in []]
fill = [sum(1 for s2 in [sh[i]] for v in [None] ) for i in []]
nsh = [len(sh[i]) for i in ids]
print("shingle count min/med/max:", min(nsh), statistics.median(nsh), max(nsh))
