#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB oracle compare.

Usage: python3 scripts/check.py <sfdir> <verify_outdir> [query...]

Reads oracle_sql.json from the verify outdir, registers each testdata
parquet as a DuckDB view, runs each oracle, and compares against the
Spark parquet dump: row count, column names (sorted), and exact value
equality (doubles compared bitwise AND with tolerance report).
"""
import sys, json, glob, os, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        spark_glob = glob.glob(f"{outdir}/{name}/*.parquet")
        if not spark_glob:
            print(f"FAIL {name}: no spark parquet dump"); n_fail += 1; continue
        try:
            oracle = con.sql(sql).fetchall()
            ocols = [d[0] for d in con.sql(sql).description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        sq = con.sql(f"SELECT * FROM read_parquet({spark_glob!r})")
        spark_rows = sq.fetchall()
        scols = [d[0] for d in sq.description]
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: cols spark={sorted(scols)} oracle={sorted(ocols)}")
            n_fail += 1; continue
        # exact duckdb type check (sorted by column name)
        otypes = dict(con.sql(
            f"SELECT column_name, column_type FROM (DESCRIBE {sql})").fetchall())
        stypes = dict(con.sql(
            f"SELECT column_name, column_type FROM (DESCRIBE SELECT * FROM read_parquet({spark_glob!r}))").fetchall())
        tdiff = [(c, stypes[c], otypes[c]) for c in sorted(ocols)
                 if stypes[c] != otypes[c]]
        if tdiff:
            print(f"WARN {name}: type mismatch {tdiff}")
        # reorder both to sorted column order (driver sorts cols by name)
        operm = [ocols.index(c) for c in sorted(ocols)]
        sperm = [scols.index(c) for c in sorted(scols)]
        orows = [tuple(r[i] for i in operm) for r in oracle]
        srows = [tuple(r[i] for i in sperm) for r in spark_rows]
        if len(orows) != len(srows):
            print(f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}")
            n_fail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            na = tuple(norm(x) for x in a); nb = tuple(norm(x) for x in b)
            if na != nb:
                bad = (i, a, b); break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]}:\n  spark ={bad[1]}\n  oracle={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

def norm(x):
    if isinstance(x, float):
        if math.isnan(x): return "nan"
        return x  # exact compare: our determinism strategy demands bit-equality
    if isinstance(x, list):
        return tuple(norm(v) for v in x)
    return x

if __name__ == "__main__":
    main()
