#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify into <verifyOutDir>/<name>/ (parquet),
runs the matching SQL from oracle_sql.json in DuckDB against the raw tables
in <sfDir>, then compares: column names (sorted), row count, and the full
multiset of values (rows sorted by all columns, exact equality — floats
compared bit-for-bit, which is the strictest possible driver behavior).
"""
import sys, json, glob, os
import duckdb

def canon(rel):
    cols = sorted(rel.columns)
    rows = rel.df()[cols].values.tolist()
    def key(r):
        return [((v is None) or (isinstance(v, float) and v != v), str(v)) for v in r]
    return cols, sorted(rows, key=key)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            oc, orows = canon(con.sql(sql))
            sc, srows = canon(con.sql(f"SELECT * FROM '{spark_glob}'"))
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if oc != sc:
            print(f"FAIL {name}: cols oracle={oc} spark={sc}"); n_fail += 1; continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rows oracle={len(orows)} spark={len(srows)}"); n_fail += 1; continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(orows, srows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(orows)} rows differ; first at {i}:\n  oracle={a}\n  spark ={b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
