#!/usr/bin/env python3
"""Documents-only fixture generator for the cap-engagement curve.

Reproduces tools/gen_testdata.py's documents recipe (vocab text 8..110
words, 0.2% exact duplicates) at an arbitrary scale factor WITHOUT
generating the full star schema — the doc-pair chains (x10/x67/x128/
x17/x20/x43) read only documents.parquet. Standalone rng (seed 47):
shape parity with the driver fixtures is all the curve needs; see
SURVEY.md "The cap-engagement curve" and
logs/bench_r10_curve_sf3.0.jsonl.

Usage: gen_docs_fixture.py <sf> <out_dir>
       e.g. 3.0 /root/repo/testdata_sf3.0_docs
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = float(sys.argv[1])
OUT = sys.argv[2]
R = np.random.default_rng(47)

VOCAB = ("query row stream part scan slow agg key window table merge join "
         "the line small group batch data sort value hash filter big column "
         "order a vector spark fast customer").split()
LANGS = ["en", "de", "zh", "fr", "es"]

import os
os.makedirs(OUT, exist_ok=True)

n_doc = int(50_000 * SF)
lens = R.integers(8, 111, n_doc)
texts = [" ".join(VOCAB[j] for j in R.integers(0, 30, lens[i]))
         for i in range(n_doc)]
for i in range(0, n_doc, 500):  # exact-dup structure for the dedup family
    if i + 1 < n_doc:
        texts[i + 1] = texts[i]
pq.write_table(pa.table({
    "doc_id": pa.array(range(n_doc), pa.int64()),
    "text": texts,
    "lang": [LANGS[i] for i in R.integers(0, 5, n_doc)],
    "source": [f"src{i}" for i in R.integers(0, 20, n_doc)],
    "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
    f"{OUT}/documents.parquet")
print("done", n_doc, OUT)
