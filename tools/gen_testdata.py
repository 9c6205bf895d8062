#!/usr/bin/env python3
"""Local testdata generator for scale factors the driver doesn't ship.

Mirrors the driver fixtures' schemas and distribution families
(TESTDATA.md tables, inspected from /root/testdata/sf0.1): TPC-H-ish
star schema + events + documents + embeddings. NOT byte-identical to
the driver's seed-42 data — the point of an extra scale factor is to
strict-replay the Spark-vs-DuckDB contract at a size the driver never
tested, so only the shapes (types, value domains, dup structure,
monotone event time, 64-dim embeddings) must match.

Usage: gen_testdata.py <sf> <out_dir>     e.g. 0.3 /root/repo/testdata_sf0.3
"""
import json
import math
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = float(sys.argv[1])
OUT = sys.argv[2]
R = np.random.default_rng(43)

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "de", "zh", "fr", "es"]
VOCAB = ("query row stream part scan slow agg key window table merge join "
         "the line small group batch data sort value hash filter big column "
         "order a vector spark fast customer").split()

DAY_US = 86_400_000_000


def write(name, cols):
    pq.write_table(pa.table(cols), f"{OUT}/{name}.parquet")
    print(name, len(next(iter(cols.values()))))


def ts_col(days_since_1995):
    base = np.datetime64("1995-01-01", "us")
    return base + (days_since_1995 * DAY_US).astype("timedelta64[us]")


import os
os.makedirs(OUT, exist_ok=True)

n_cust = int(150_000 * SF)
n_supp = int(10_000 * SF)
n_part = int(200_000 * SF)
n_ord = int(1_500_000 * SF)
n_li = int(6_000_000 * SF)
n_ev = int(1_000_000 * SF)
n_doc = int(50_000 * SF)
n_vec = int(20_000 * SF)
n_users = int(15_000 * SF)

write("region", {"r_regionkey": pa.array(range(5), pa.int32()),
                 "r_name": REGIONS})
write("nation", {"n_nationkey": pa.array(range(25), pa.int32()),
                 "n_name": [f"NATION_{i:02d}" for i in range(25)],
                 "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())})
write("customer", {
    "c_custkey": pa.array(range(n_cust), pa.int64()),
    "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
    "c_nationkey": pa.array(R.integers(0, 25, n_cust), pa.int32()),
    "c_acctbal": np.round(R.uniform(-999.99, 9999.99, n_cust), 2),
    "c_mktsegment": [SEGMENTS[i] for i in R.integers(0, 5, n_cust)]})
write("supplier", {
    "s_suppkey": pa.array(range(n_supp), pa.int64()),
    "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
    "s_nationkey": pa.array(R.integers(0, 25, n_supp), pa.int32()),
    "s_acctbal": np.round(R.uniform(-999.99, 9999.99, n_supp), 2)})
write("part", {
    "p_partkey": pa.array(range(n_part), pa.int64()),
    "p_name": [f"part {VOCAB[i % 30]} {VOCAB[(i * 7) % 30]}" for i in range(n_part)],
    "p_brand": [f"Brand#{i % 5 + 1}{(i * 3) % 5 + 1}" for i in range(n_part)],
    "p_type": [f"{VOCAB[i % 30].upper()} TYPE" for i in range(n_part)],
    "p_size": pa.array(R.integers(1, 51, n_part), pa.int32()),
    "p_retailprice": np.round(R.uniform(900, 2100, n_part), 2)})

o_days = R.integers(0, 2404, n_ord)  # 1995-01-01 .. ~2001-08
write("orders", {
    "o_orderkey": pa.array(range(n_ord), pa.int64()),
    "o_custkey": pa.array(R.integers(0, n_cust, n_ord), pa.int64()),
    "o_orderstatus": [["O", "F", "P"][i] for i in R.integers(0, 3, n_ord)],
    "o_totalprice": np.round(R.uniform(1000, 500000, n_ord), 2),
    "o_orderdate": ts_col(o_days),
    "o_orderpriority": [PRIORITIES[i] for i in R.integers(0, 5, n_ord)]})

li_ord = R.integers(0, n_ord, n_li)
write("lineitem", {
    "l_orderkey": pa.array(li_ord, pa.int64()),
    "l_partkey": pa.array(R.integers(0, n_part, n_li), pa.int64()),
    "l_suppkey": pa.array(R.integers(0, n_supp, n_li), pa.int64()),
    "l_linenumber": pa.array(R.integers(1, 8, n_li), pa.int32()),
    "l_quantity": R.integers(1, 51, n_li).astype(np.float64),
    "l_extendedprice": np.round(R.uniform(900, 100000, n_li), 2),
    "l_discount": np.round(R.integers(0, 11, n_li) / 100.0, 2),
    "l_tax": np.round(R.integers(0, 9, n_li) / 100.0, 2),
    "l_returnflag": [["N", "A", "R"][i] for i in R.integers(0, 3, n_li)],
    "l_linestatus": [["O", "F"][i] for i in R.integers(0, 2, n_li)],
    "l_shipdate": ts_col(o_days[li_ord] + R.integers(1, 95, n_li))})

# events: monotone ts over Jan 2024, value rounded to 2, json props
ev_ts = np.sort(R.integers(0, 30 * DAY_US, n_ev))
write("events", {
    "event_id": pa.array(range(n_ev), pa.int64()),
    "ts": np.datetime64("2024-01-01", "us") + ev_ts.astype("timedelta64[us]"),
    "user_id": pa.array(R.integers(0, n_users, n_ev), pa.int64()),
    "event_type": [EVENT_TYPES[i] for i in R.integers(0, 5, n_ev)],
    "value": np.round(R.uniform(0, 560, n_ev), 2),
    "props": [json.dumps({"k": int(k)}) for k in R.integers(0, 100, n_ev)]})

# documents: vocab text 8..110 words, ~0.2% exact duplicates
lens = R.integers(8, 111, n_doc)
texts = [" ".join(VOCAB[j] for j in R.integers(0, 30, lens[i]))
         for i in range(n_doc)]
for i in range(0, n_doc, 500):  # exact-dup structure for the dedup family
    if i + 1 < n_doc:
        texts[i + 1] = texts[i]
write("documents", {
    "doc_id": pa.array(range(n_doc), pa.int64()),
    "text": texts,
    "lang": [LANGS[i] for i in R.integers(0, 5, n_doc)],
    "source": [f"src{i}" for i in R.integers(0, 20, n_doc)],
    "n_chars": pa.array([len(t) for t in texts], pa.int64())})

emb = np.round(R.normal(0, 0.13, (n_vec, 64)), 8).astype(np.float32)
write("embeddings", {
    "vec_id": pa.array(range(n_vec), pa.int64()),
    "embedding": pa.array([e.tolist() for e in emb],
                          pa.list_(pa.float32())),
    "label": pa.array(R.integers(0, 10, n_vec), pa.int32())})
print("done", OUT)
