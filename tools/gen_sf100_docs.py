#!/usr/bin/env python3
"""Extend the sf100 bench tier with a documents table at rep=1000
(~5M docs from the driver's sf0.1 corpus) so the text family has an
at-scale grounding row, the same way round-16's endpoint corpus
grounded ANN. Same replica rule as gen_sf1.py: replica text is a
seeded word-level shuffle (same length/vocab distribution, disjoint
shingle sets — a plain copy would plant 1000-way duplicate cliques).
Batched ParquetWriter: the 5M-row table never sits in memory at once.

Usage: gen_sf100_docs.py [src_sf_dir] [out_dir] [rep]
  defaults: /root/testdata/sf0.1 /root/repo/testdata-sf100 1000
"""
import sys, random
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata-sf100"
REP = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

con = duckdb.connect()
docs = con.execute(
    f"SELECT doc_id, text, lang, source FROM read_parquet('{src}/documents.parquet') ORDER BY doc_id"
).fetchall()
S_DOC = max(d[0] for d in docs) + 1

schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                    ("lang", pa.string()), ("source", pa.string()),
                    ("n_chars", pa.int64())])
writer = pq.ParquetWriter(f"{out}/documents.parquet", schema)
for r in range(REP):
    rows = {k: [] for k in ("doc_id", "text", "lang", "source", "n_chars")}
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
    writer.write_table(pa.table(rows, schema=schema))
    if (r + 1) % 100 == 0:
        print(f"rep {r + 1}/{REP}", flush=True)
writer.close()
print(f"documents: {len(docs) * REP} rows -> {out}/documents.parquet", flush=True)
