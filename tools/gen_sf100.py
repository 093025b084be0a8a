#!/usr/bin/env python3
"""sf100 bench tier: RELATIONAL tables only (lineitem + orders), the
gen_sf1.py replication machinery at rep=1000 — the tables Bench's sf100
scan-aggregate/factorized rows read. Text/vector tables are omitted on
purpose: no sf100 bench row reads them and their python-side
re-randomization at rep=1000 costs more than the tier is worth.

Usage: gen_sf100.py [src_sf_dir] [out_dir] [rep]
  defaults: /root/testdata/sf0.1 /root/repo/testdata-sf100 1000
"""
import os, sys
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata-sf100"
REP = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
os.makedirs(out, exist_ok=True)

con = duckdb.connect()

def stride(table, key):
    return con.execute(
        f"SELECT max({key})+1 FROM read_parquet('{src}/{table}.parquet')").fetchone()[0]

S_CUST = stride("customer", "c_custkey")
S_PART = stride("part", "p_partkey")
S_SUPP = stride("supplier", "s_suppkey")
S_ORD = stride("orders", "o_orderkey")

def copy_sql(table, select):
    con.execute(f"""
      COPY ({select.replace('@T', f"read_parquet('{src}/{table}.parquet')")})
      TO '{out}/{table}.parquet' (FORMAT PARQUET)""")
    print(f"{table}: done", flush=True)

copy_sql("orders", f"""
  SELECT o_orderkey + r*{S_ORD} AS o_orderkey,
         o_custkey + r*{S_CUST} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM @T, range({REP}) t(r)""")
copy_sql("lineitem", f"""
  SELECT l_orderkey + r*{S_ORD} AS l_orderkey,
         l_partkey + r*{S_PART} AS l_partkey,
         l_suppkey + r*{S_SUPP} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM @T, range({REP}) t(r)""")
print("done", flush=True)
