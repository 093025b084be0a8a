#!/usr/bin/env python3
"""Generate an sf1 bench tier (~10x sf0.1) from the driver's sf0.1
parquet, deterministically (seed 42), preserving referential integrity.

The sf0.1 tables are replicated with key strides; text/vector payloads
are re-randomized per replica so dedup/ANN workloads keep a realistic
shape (a plain 10x copy would plant 10-way near-duplicate cliques and
blow up every bucketed candidate generator quadratically):
  - documents: replica text is a seeded word-level shuffle of the
    original (same length/vocab distribution, disjoint shingle sets)
  - embeddings: replica vec = 0.8*orig + 0.6*std*gauss(seed) -- keeps
    the label-cluster structure, kills near-identical copies

Usage: gen_sf1.py [src_sf_dir] [out_dir] [rep] [rep_emb]
  defaults: /root/testdata/sf0.1 /root/repo/testdata-sf1 10 16  (= sf1)
  sf10:     gen_sf1.py /root/testdata/sf0.1 /root/repo/testdata-sf10 100 160
"""
import os, sys, random
import numpy as np
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata-sf1"
REP = int(sys.argv[3]) if len(sys.argv) > 3 else 10       # relational / documents
REP_EMB = int(sys.argv[4]) if len(sys.argv) > 4 else 16   # embeddings
os.makedirs(out, exist_ok=True)

con = duckdb.connect()

def stride(table, key):
    return con.execute(
        f"SELECT max({key})+1 FROM read_parquet('{src}/{table}.parquet')").fetchone()[0]

S_CUST = stride("customer", "c_custkey")
S_SUPP = stride("supplier", "s_suppkey")
S_PART = stride("part", "p_partkey")
S_ORD = stride("orders", "o_orderkey")
S_EVT = stride("events", "event_id")
S_USER = stride("events", "user_id")
S_DOC = stride("documents", "doc_id")
S_VEC = stride("embeddings", "vec_id")

def copy_sql(table, select):
    con.execute(f"""
      COPY ({select.replace('@T', f"read_parquet('{src}/{table}.parquet')")})
      TO '{out}/{table}.parquet' (FORMAT PARQUET)""")
    n = pq.read_metadata(f"{out}/{table}.parquet").num_rows
    print(f"{table}: {n} rows", flush=True)

# dimension tables too small to replicate meaningfully: copy as-is
for t in ["region", "nation"]:
    copy_sql(t, "SELECT * FROM @T")

copy_sql("customer", f"""
  SELECT c_custkey + r*{S_CUST} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM @T, range({REP}) t(r)""")
copy_sql("supplier", f"""
  SELECT s_suppkey + r*{S_SUPP} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM @T, range({REP}) t(r)""")
copy_sql("part", f"""
  SELECT p_partkey + r*{S_PART} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM @T, range({REP}) t(r)""")
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
copy_sql("events", f"""
  SELECT event_id + r*{S_EVT} AS event_id, ts,
         user_id + r*{S_USER} AS user_id, event_type, value, props
  FROM @T, range({REP}) t(r)""")

# documents: word-shuffled replicas (disjoint shingles, same vocabulary)
docs = con.execute(
    f"SELECT doc_id, text, lang, source FROM read_parquet('{src}/documents.parquet') ORDER BY doc_id"
).fetchall()
rows = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
for r in range(REP):
    for doc_id, text, lang, source in docs:
        if r == 0:
            t = text
        else:
            words = text.split(" ")
            random.Random(42 + r * 1000003 + doc_id).shuffle(words)
            t = " ".join(words)
        rows["doc_id"].append(doc_id + r * S_DOC)
        rows["text"].append(t)
        rows["lang"].append(lang)
        rows["source"].append(source)
        rows["n_chars"].append(len(t))
# bounded row groups: a single-group file is ONE Spark input split and
# ONE DuckDB scan thread — the whole text tier would serialize onto a
# single core on both engines (measured round 17: the 1000-group sf100
# file scanned 10x the data in 1/3 the time of the 1-group sf10 file)
pq.write_table(pa.table(rows), f"{out}/documents.parquet", row_group_size=8192)
print(f"documents: {len(rows['doc_id'])} rows", flush=True)

# embeddings: cluster-preserving noisy replicas
emb = con.execute(
    f"SELECT vec_id, embedding, label FROM read_parquet('{src}/embeddings.parquet') ORDER BY vec_id"
).fetchall()
vecs = np.array([e[1] for e in emb], dtype=np.float64)
std = float(vecs.std())
ids, out_vecs, labels = [], [], []
for r in range(REP_EMB):
    rng = np.random.default_rng(42 + r)
    if r == 0:
        v = vecs
    else:
        v = 0.8 * vecs + 0.6 * std * rng.standard_normal(vecs.shape)
    out_vecs.append(v.astype(np.float32))
    ids.extend(int(e[0]) + r * S_VEC for e in emb)
    labels.extend(e[2] for e in emb)
allv = np.concatenate(out_vecs)
tbl = pa.table({
    "vec_id": pa.array(ids, pa.int64()),
    "embedding": pa.array(list(allv), pa.list_(pa.float32())),
    "label": pa.array(labels),
})
pq.write_table(tbl, f"{out}/embeddings.parquet", row_group_size=8192)
print(f"embeddings: {len(ids)} rows", flush=True)
print("done", flush=True)
