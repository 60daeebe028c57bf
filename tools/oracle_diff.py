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
            if dn == sn and dc == sc:
                print(f"{name} OK {len(sn)} rows")
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
