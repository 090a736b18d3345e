#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql vs Verify parquet dumps.

Mimics the driver's DuckDB-oracle comparison: for each query with an
oracle, run the SQL in DuckDB over the sf parquet tables and compare to
the Spark result parquet (columns sorted by name, rows sorted by all
columns). Usage: python3 tools/check_oracle.py <sfDir> <verifyOut>
"""
import json, os, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = round(v, 6)
            vals.append(repr(v))
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in idx], out

def main(sf_dir, verify_out):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; ScaleGen (sf1) writes Spark
        # directories of part files — read whichever shape exists
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{verify_out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            o = con.execute(sql)
            ocols = [d[0] for d in o.description]
            orows = o.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            s = con.execute(f"SELECT * FROM read_parquet('{verify_out}/{name}/*.parquet')")
            scols = [d[0] for d in s.description]
            srows = s.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        oc, orows_c = canon(orows, ocols)
        sc, srows_c = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns differ oracle={oc} spark={sc}")
            n_fail += 1
        elif orows_c != srows_c:
            diff = [(a, b) for a, b in zip(orows_c, srows_c) if a != b][:3]
            print(f"FAIL {name}: rows differ (oracle {len(orows_c)} vs spark {len(srows_c)})")
            for a, b in diff:
                print(f"  oracle: {a}\n  spark : {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows_c)} rows)")
            n_pass += 1
    # queries with no oracle: rows-only check
    for name in sorted(os.listdir(verify_out)):
        p = os.path.join(verify_out, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                n = con.execute(f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
                print(f"ROWS {name}: {n} rows")
            except Exception as e:
                print(f"FAIL {name}: unreadable: {e}")
                n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
