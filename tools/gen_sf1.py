#!/usr/bin/env python3
"""Generate a local sf1 dataset (10x sf0.1) for the scale soak (SCALE.md).

Driver-side tooling only (duckdb/pandas are not available to the Scala
library). Relational tables replicate 10x with key offsets so foreign keys
stay consistent and cardinalities scale like a real sf1; dims (nation,
region) stay fixed. Documents get per-replica word-level bootstrap text
(same per-doc vocabulary and length distribution, deterministic seed) so
text statistics match the generator's profile; embeddings get small
deterministic per-replica perturbations so replicas are near but not
exact duplicates. Output: /root/sf1_local/*.parquet (written outside
/root/testdata, which is read-only).
"""
import duckdb
import random

SRC = "/root/testdata/sf0.1"
DST = "/root/sf1_local"
REPS = 10

import os
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"

# key ranges (offsets use max+1 so replicated keys never collide)
K = {}
for t, k in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
             ("part", "p_partkey"), ("orders", "o_orderkey"),
             ("events", "event_id"), ("events", "user_id"),
             ("embeddings", "vec_id"), ("documents", "doc_id")]:
    K[k] = con.execute(f"SELECT max({k}) + 1 FROM {src(t)}").fetchone()[0]

def replicate(table, exprs):
    sel = ", ".join(exprs)
    union = " UNION ALL ".join(
        f"SELECT {sel} FROM {src(table)}, (SELECT {r} AS r)" for r in range(REPS))
    con.execute(f"COPY ({union}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(table, n)

for t in ("nation", "region"):
    con.execute(f"COPY (SELECT * FROM {src(t)}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied")

replicate("customer", [f"c_custkey + r * {K['c_custkey']} AS c_custkey",
                       "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"])
replicate("supplier", [f"s_suppkey + r * {K['s_suppkey']} AS s_suppkey",
                       "s_name", "s_nationkey", "s_acctbal"])
replicate("part", [f"p_partkey + r * {K['p_partkey']} AS p_partkey",
                   "p_name", "p_brand", "p_type", "p_size", "p_retailprice"])
replicate("orders", [f"o_orderkey + r * {K['o_orderkey']} AS o_orderkey",
                     f"o_custkey + r * {K['c_custkey']} AS o_custkey",
                     "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"])
replicate("lineitem", [f"l_orderkey + r * {K['o_orderkey']} AS l_orderkey",
                       f"l_partkey + r * {K['p_partkey']} AS l_partkey",
                       f"l_suppkey + r * {K['s_suppkey']} AS l_suppkey",
                       "l_linenumber", "l_quantity", "l_extendedprice",
                       "l_discount", "l_tax", "l_returnflag", "l_linestatus",
                       "l_shipdate"])
replicate("events", [f"event_id + r * {K['event_id']} AS event_id", "ts",
                     f"user_id + r * {K['user_id']} AS user_id",
                     "event_type", "value", "props"])
# embeddings: deterministic per-replica jitter (never exact duplicates)
replicate("embeddings", [
    f"vec_id + r * {K['vec_id']} AS vec_id",
    "CAST(list_transform(range(1, 65), i -> embedding[i] + "
    "CASE WHEN r = 0 THEN 0.0 ELSE ((vec_id * 31 + i * 7 + r) % 17 - 8) * 0.002 END) "
    "AS FLOAT[]) AS embedding",
    "label"])

# documents: replica 0 verbatim; replicas 1..9 are word-level bootstraps of
# their parent doc (same vocab + length, deterministic seed)
docs = con.execute(
    f"SELECT doc_id, text, lang, source, n_chars FROM {src('documents')} ORDER BY doc_id"
).fetchall()
rows = []
for (doc_id, text, lang, source, n_chars) in docs:
    rows.append((doc_id, text, lang, source, n_chars))
    words = text.split(" ")
    for r in range(1, REPS):
        rng = random.Random(doc_id * 1000 + r)
        bt = " ".join(rng.choice(words) for _ in range(len(words)))
        rows.append((doc_id + r * K["doc_id"], bt, lang, source, len(bt)))
import pandas as pd
df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
con.register("docs_new", df)
con.execute(f"COPY (SELECT * FROM docs_new ORDER BY doc_id) TO '{DST}/documents.parquet' (FORMAT PARQUET)")
print("documents", len(df))
print("done ->", DST)
