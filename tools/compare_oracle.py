#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result,
run the oracle SQL (from oracle_sql.json) in DuckDB with the sfDir
tables registered as views, canonicalize both sides (sort columns by
name, sort rows, render values), and diff.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    def render(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if v != v:
                return "NaN"
            return repr(round(v, 6))
        return str(v)
    rows = [tuple(render(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows), list(df.columns)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rowsonly = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"EMPTY-DIR {name}")
            n_fail += 1
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracles:
            ok = len(spark_df) > 0
            print(f"{'ROWS-ONLY-PASS' if ok else 'ROWS-ONLY-FAIL'} {name} "
                  f"({len(spark_df)} rows)")
            n_rowsonly += 1
            n_fail += 0 if ok else 1
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"ORACLE-SQL-ERROR {name}: {e}")
            n_fail += 1
            continue
        s_rows, s_cols = canon(spark_df)
        o_rows, o_cols = canon(oracle_df)
        if s_cols != o_cols:
            print(f"SCHEMA-MISMATCH {name}: spark={s_cols} oracle={o_cols}")
            n_fail += 1
        elif s_rows != o_rows:
            n_fail += 1
            o_set, s_set = set(o_rows), set(s_rows)
            diff_s = [r for r in s_rows if r not in o_set][:3]
            diff_o = [r for r in o_rows if r not in s_set][:3]
            print(f"ROW-MISMATCH {name}: {len(s_rows)} vs {len(o_rows)} rows")
            print(f"  spark-only: {diff_s}")
            print(f"  oracle-only: {diff_o}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(s_rows)} rows)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
