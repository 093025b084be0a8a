#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare: run each
oracle_sql.json query against the testdata parquet, compare with the
Spark parquet dump (columns sorted by name, values hashed)."""
import sys, json, glob, duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"{name}: MISSING spark output"); fails += 1; continue
    got = con.execute(f"SELECT * FROM read_parquet({spark_files!r})").fetchdf()
    exp = con.execute(sql).fetchdf()
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"{name}: SCHEMA mismatch {list(got.columns)} vs {list(exp.columns)}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"{name}: ROWS {len(got)} vs {len(exp)}"); fails += 1; continue
    gh = [tuple(r) for r in got.itertuples(index=False)]
    eh = [tuple(r) for r in exp.itertuples(index=False)]
    if gh != eh:
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(gh, eh)) if a != b][:3]
        print(f"{name}: VALUE mismatch, first diffs {bad}"); fails += 1; continue
    print(f"{name}: OK ({len(got)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
