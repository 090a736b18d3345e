#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql vs Verify parquet dumps.

Mimics the driver's DuckDB-oracle comparison: for each query with an
oracle, run the SQL in DuckDB over the sf parquet tables and compare to
the Spark result parquet (columns sorted by name, rows sorted by all
columns), AND enforce physical-type parity via `DESCRIBE`.

Why the type guard exists: DuckDB's `sum()` over integer columns yields
HUGEINT (int128), which Python's fetch canonicalizes to a plain int —
so a value-level compare here passes while the driver's type-sensitive
compare fails. That divergence class burned driver rounds 6-10
(`ev_ab_test`, `pipeline_split`). The rule it enforces: every integer
aggregate in oracle SQL must be CAST to the Spark result's physical
type (`CAST(sum(x) AS BIGINT)`).

Usage:
  python3 tools/check_oracle.py <sfDir> <verifyOut>            # values + types
  python3 tools/check_oracle.py --types <sfDir> <verifyOut>    # types only, fast
                                                               # (no query execution)
Types-only mode also writes <repo>/TYPEPARITY.json, the sweep artifact
asserted by TypeParitySpec in `sbt test`.

Env knobs (for the sf1 6M-row replay, where the 32-permutation MinHash
oracles exhaust DuckDB's 40 GiB temp budget — documented infeasible
since round 8 — and a temp-exhausted attempt can leave the SHARED
connection allocation-poisoned for later spill-heavy queries):
  GRAFT_ORACLE_SKIP=a,b   skip these oracle names (recorded as SKIP)
  GRAFT_ORACLE_ONLY=a,b   run only these oracle names
"""
import json, os, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB logical types with no Spark physical equivalent: a parquet file
# cannot carry them, so any oracle producing one is guaranteed to diverge
# from the Spark result under a type-sensitive driver compare.
FORBIDDEN_ORACLE_TYPES = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER",
                          "USMALLINT", "UTINYINT"}

# Oracle-type -> Spark-parquet-type pairs allowed to differ textually.
# This is EXACTLY the set of divergent pairs observed across the 154
# hash-green queries of CORRECTNESS_r10 (sweep: 2026-08-14) — i.e.
# pairs the driver's compare provably canonicalizes identically.
# Anything not listed here and not strictly equal is a FAIL: a new
# divergence pair must be green-listed only after a driver round
# proves it, not assumed.
ALLOWED_PAIRS = {
    # 22 green queries compute an int expression the oracle types
    # BIGINT while Spark's result column is int32 (e.g. a rank/count
    # cast); both fetch as Python int → driver-equivalent.
    ("BIGINT", "INTEGER"),
}


def connect_views(sf_dir):
    con = duckdb.connect()
    # in-memory connections default to max_temp_directory_size=0 (no
    # spill at all) — the sf1 minhash replay needs ~tens of GB of sort
    # spill for the 32-permutation sketch, so allow a bounded temp dir
    con.execute("SET temp_directory='/tmp/duckdb_oracle_tmp'")
    con.execute("SET max_temp_directory_size='40GiB'")
    for t in TABLES:
        # driver testdata ships single files; ScaleGen (sf1) writes Spark
        # directories of part files — read whichever shape exists
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


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


def describe_types(con, sql):
    """DESCRIBE a query -> {column_name: canonical_type}. Planning only,
    no execution — safe for the heaviest oracles."""
    rows = con.execute(f"DESCRIBE ({sql})").fetchall()
    return {r[0]: r[1].upper() for r in rows}


def type_check(name, otypes, stypes):
    """Return list of human-readable type-parity problems (empty = ok)."""
    problems = []
    for col, ot in sorted(otypes.items()):
        base = ot.split("(")[0]
        if base in FORBIDDEN_ORACLE_TYPES:
            problems.append(
                f"{col}: oracle type {ot} has no Spark physical equivalent "
                f"— CAST the aggregate (e.g. CAST(sum(..) AS BIGINT))")
    if set(otypes) != set(stypes):
        problems.append(
            f"column sets differ: oracle-only={sorted(set(otypes)-set(stypes))} "
            f"spark-only={sorted(set(stypes)-set(otypes))}")
        return problems
    for col in sorted(otypes):
        ot, st = otypes[col], stypes[col]
        if ot == st or (ot, st) in ALLOWED_PAIRS:
            continue
        ob, sb = ot.split("(")[0], st.split("(")[0]
        if ob == "DECIMAL" and sb == "DECIMAL":
            problems.append(
                f"{col}: DECIMAL precision/scale mismatch oracle={ot} "
                f"spark={st} — align the CAST's (p,s) with Spark's result type")
        elif ob not in FORBIDDEN_ORACLE_TYPES:
            problems.append(f"{col}: type mismatch oracle={ot} spark={st}")
    return problems


def sweep_types(sf_dir, verify_out, artifact_path):
    """Types-only sweep over every oracle; writes the TYPEPARITY.json
    artifact {query: {status, oracle_types, spark_types, problems}}."""
    con = connect_views(sf_dir)
    oracle = json.load(open(f"{verify_out}/oracle_sql.json"))
    report, n_fail = {}, 0
    for name, sql in sorted(oracle.items()):
        try:
            otypes = describe_types(con, sql)
        except Exception as e:
            report[name] = {"status": "fail", "problems": [f"oracle DESCRIBE error: {e}"]}
            print(f"TYPE-FAIL {name}: oracle DESCRIBE error: {e}")
            n_fail += 1
            continue
        try:
            stypes = describe_types(
                con, f"SELECT * FROM read_parquet('{verify_out}/{name}/*.parquet')")
        except Exception as e:
            report[name] = {"status": "fail", "problems": [f"spark result missing: {e}"]}
            print(f"TYPE-FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        problems = type_check(name, otypes, stypes)
        report[name] = {"status": "fail" if problems else "ok",
                        "oracle_types": otypes, "spark_types": stypes,
                        "problems": problems}
        if problems:
            n_fail += 1
            print(f"TYPE-FAIL {name}:")
            for p in problems:
                print(f"  {p}")
        else:
            print(f"TYPE-OK  {name}")
    if artifact_path:
        with open(artifact_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_queries": len(oracle),
                       "n_fail": n_fail, "queries": report}, f, indent=1,
                      sort_keys=True)
        print(f"\nwrote {artifact_path}")
    print(f"\ntypes: {len(oracle) - n_fail} ok, {n_fail} fail")
    return 1 if n_fail else 0


def main(sf_dir, verify_out):
    con = connect_views(sf_dir)
    oracle = json.load(open(f"{verify_out}/oracle_sql.json"))
    skip = set(filter(None, os.environ.get("GRAFT_ORACLE_SKIP", "").split(",")))
    only = set(filter(None, os.environ.get("GRAFT_ORACLE_ONLY", "").split(",")))
    n_pass = n_fail = n_typefail = n_skip = 0
    for name, sql in sorted(oracle.items()):
        if name in skip or (only and name not in only):
            print(f"SKIP {name}")
            n_skip += 1
            continue
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
        # physical-type parity first: a value-level PASS with a HUGEINT
        # oracle is exactly the false-green this guard exists to kill
        tproblems = type_check(name,
                               describe_types(con, sql),
                               describe_types(con, f"SELECT * FROM read_parquet('{verify_out}/{name}/*.parquet')"))
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
        elif tproblems:
            print(f"TYPE-FAIL {name}: values match but physical types diverge "
                  f"(driver would red this):")
            for p in tproblems:
                print(f"  {p}")
            n_typefail += 1
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
    # n_skip rides in the summary so a tail excerpt from a SKIP/ONLY run
    # can never read as full-coverage green
    print(f"\n{n_pass} pass, {n_fail} fail, {n_typefail} type-fail, {n_skip} skipped")
    return 1 if (n_fail or n_typefail) else 0


if __name__ == "__main__":
    if sys.argv[1] == "--types":
        sys.exit(sweep_types(sys.argv[2], sys.argv[3],
                             os.path.join(os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__))), "TYPEPARITY.json")))
    sys.exit(main(sys.argv[1], sys.argv[2]))
