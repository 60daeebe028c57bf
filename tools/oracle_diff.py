#!/usr/bin/env python3
"""Driver-style correctness diff: run each oracle SQL in DuckDB over the sf
tables and compare (sorted columns, stringified, sorted rows) against the
parquet dumped by graft.Verify. Usage: oracle_diff.py <sfDir> <verifyOutDir>.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rows), [cols[i] for i in order]

# The driver's hash is TYPE-sensitive (r2: a DuckDB HUGEINT vs Spark BIGINT
# hashed differently while str() values matched). Canonicalize both sides'
# types and fail on any mismatch so it can't slip past the local gate again.
def duck_canon(t):
    t = t.upper()
    if t.startswith("DECIMAL"): return "decimal"
    return {"TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "long",
            "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "long",
            "FLOAT": "float", "DOUBLE": "double", "VARCHAR": "string",
            "BOOLEAN": "bool", "DATE": "date", "BLOB": "binary"}.get(
        t, "timestamp" if t.startswith("TIMESTAMP") else f"UNSUPPORTED:{t}")

def arrow_canon(t):
    s = str(t)
    if s.startswith("decimal"): return "decimal"
    if s.startswith("timestamp"): return "timestamp"
    if s.startswith("list") or s.startswith("large_list"): return f"UNSUPPORTED:{s}"
    return {"int8": "int", "int16": "int", "int32": "int", "int64": "long",
            "float": "float", "halffloat": "float", "double": "double",
            "string": "string", "large_string": "string", "bool": "bool",
            "date32[day]": "date", "binary": "binary", "large_binary": "binary"}.get(
        s, f"UNSUPPORTED:{s}")

def type_diff(con, sql, table):
    duck = {r[0]: duck_canon(r[1]) for r in con.execute(f"DESCRIBE ({sql})").fetchall()}
    spark = {f.name: arrow_canon(f.type) for f in table.schema}
    return [f"{c}: spark={spark.get(c, '<absent>')} duck={d}"
            for c, d in sorted(duck.items()) if spark.get(c) != d]

def main(sf, out):
    con = duckdb.connect()
    for f in glob.glob(f"{sf}/*.parquet"):
        con.execute(f"CREATE VIEW {os.path.basename(f)[:-8]} AS SELECT * FROM read_parquet('{f}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    failed = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(sql)
            dcols = [c[0] for c in res.description]
            drows = res.fetchall()
            t = pq.read_table(glob.glob(f"{out}/{name}/*.parquet")[0])
            scols = t.column_names
            srows = [tuple(t.column(c)[i].as_py() for c in scols) for i in range(t.num_rows)]
            dn, dc = norm(drows, dcols)
            sn, sc = norm(srows, scols)
            tdiff = type_diff(con, sql, t)
            if dn == sn and dc == sc and not tdiff:
                print(f"{name} OK {len(sn)} rows")
            elif tdiff:
                failed += 1
                print(f"{name} TYPE_MISMATCH {'; '.join(tdiff)}")
            else:
                failed += 1
                print(f"{name} MISMATCH cols {sc} vs {dc} rows {len(sn)} vs {len(dn)}")
                for a, b in zip(sn, dn):
                    if a != b:
                        print(f"  spark: {a}\n  duck : {b}")
                        break
        except Exception as e:
            failed += 1
            print(f"{name} ERROR {e}")
    rows_only = [q for q in os.listdir(out) if q != "oracle_sql.json" and q not in oracle]
    for q in sorted(rows_only):
        n = sum(pq.read_table(f).num_rows for f in glob.glob(f"{out}/{q}/*.parquet"))
        print(f"{q} ROWS_ONLY {n} rows{' (EMPTY!)' if n == 0 else ''}")
        if n == 0:
            failed += 1
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
