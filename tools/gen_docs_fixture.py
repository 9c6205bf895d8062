#!/usr/bin/env python3
"""Documents-only fixture generator for the cap-engagement curve.

Default mode reproduces tools/gen_testdata.py's documents recipe (vocab
text 8..110 words, 0.2% exact duplicates) at an arbitrary scale factor
WITHOUT generating the full star schema — the doc-pair chains (x10/x67/
x128/x17/x20/x43) read only documents.parquet. Standalone rng (seed 47):
shape parity with the driver fixtures is all the curve needs; see
SURVEY.md "The cap-engagement curve" and logs/bench_r10_curve_sf3.0.jsonl.

`heaps` mode is the round-12 realistic-text twin: the 30-word bounded
vocabulary is ADVERSARIAL past ~sf1.0 (every 3-shingle saturates to
df ∝ N, no rare tail — SURVEY §8's honesty note), so scale conclusions
drawn from it don't transfer to real corpora. Real text obeys Heaps'
law (type inventory V(T) ≈ K·T^β, β ≈ 0.4-0.6) with Zipf-distributed
type frequencies; iid sampling from a Zipf(s) distribution over a
T^β-sized inventory reproduces both (Heaps β ≈ 1/s for the observed
curve). Same doc count, length law, exact-dup structure, and seed as
the default mode — ONLY the text generator changes, so recall/cap
numbers are comparable across the two corpora. The post-text columns
(lang/source) draw from a DEDICATED rng (seed 48) in both modes: the
two text generators consume the shared stream differently (one
R.choice vs per-doc R.integers), so any draw made from R after text
generation would silently diverge between modes at the same sf/seed
(round-12 ADVICE finding).

`emb` mode (round 14) writes embeddings.parquet ONLY — the similarity
twin of the planted-documents oracle: same schema/dim/value-law as
gen_testdata.py's embeddings (n_vec = 20k*sf, 64-dim N(0, 0.13),
labels 0..9) plus PLANTED near-neighbor pairs: for i % 200 == 0,
vec[i+1] = vec[i] + N(0, 0.05*0.13) — planted cosine ~0.9987 (the
SemDeDup-style near-dup tier), making vec i the true nearest
neighbor of vec i+1 with near-certainty in 64 dims, so ANN recall at
SFs where the brute-force truth is expensive reduces to "did the
index return the twin". Dedicated rng (seed 49): emb mode shares no
stream with the text modes.

Usage: gen_docs_fixture.py <sf> <out_dir> [heaps|emb]
       e.g. 3.0 /root/repo/testdata_sf3.0_docs
            1.0 /root/repo/testdata_sf1.0_heaps heaps
            10.0 /root/repo/testdata_sf10.0_emb emb
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = float(sys.argv[1])
OUT = sys.argv[2]
MODE = sys.argv[3] if len(sys.argv) > 3 else "bounded"
R = np.random.default_rng(47)   # lengths + text: the shape-parity stream
R2 = np.random.default_rng(48)  # post-text columns: mode-independent

VOCAB = ("query row stream part scan slow agg key window table merge join "
         "the line small group batch data sort value hash filter big column "
         "order a vector spark fast customer").split()
LANGS = ["en", "de", "zh", "fr", "es"]

# Heaps/Zipf parameters (heaps mode): V = ceil(K_HEAPS * T^BETA) types,
# frequencies ∝ rank^-ZIPF_S. At sf1.0 (T ≈ 2.95M tokens) V ≈ 17k types;
# the rank tail gives every doc a few corpus-rare shingles — the
# structure maxDfFraction blocking exploits on real text.
BETA = 0.5
K_HEAPS = 10.0
ZIPF_S = 1.07

os.makedirs(OUT, exist_ok=True)

if MODE == "emb":
    R3 = np.random.default_rng(49)
    n_vec = int(20_000 * SF)
    emb = np.round(R3.normal(0, 0.13, (n_vec, 64)), 8).astype(np.float32)
    planted = np.arange(0, n_vec - 1, 200)
    emb[planted + 1] = np.round(
        emb[planted] + R3.normal(0, 0.05 * 0.13, (len(planted), 64)),
        8).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n_vec), pa.int64()),
        "embedding": pa.array([e.tolist() for e in emb],
                              pa.list_(pa.float32())),
        "label": pa.array(R3.integers(0, 10, n_vec), pa.int32())}),
        f"{OUT}/embeddings.parquet")
    cos = (emb[planted] * emb[planted + 1]).sum(1) / (
        np.linalg.norm(emb[planted], axis=1) *
        np.linalg.norm(emb[planted + 1], axis=1))
    print(f"done emb n_vec={n_vec} planted={len(planted)} "
          f"cos[min/mean]={cos.min():.5f}/{cos.mean():.5f} {OUT}")
    sys.exit(0)

n_doc = int(50_000 * SF)
lens = R.integers(8, 111, n_doc)
if MODE == "bounded":
    texts = [" ".join(VOCAB[j] for j in R.integers(0, 30, lens[i]))
             for i in range(n_doc)]
elif MODE == "heaps":
    T = int(lens.sum())
    V = max(1000, int(np.ceil(K_HEAPS * T ** BETA)))
    p = np.arange(1, V + 1, dtype=np.float64) ** -ZIPF_S
    p /= p.sum()
    toks = R.choice(V, T, p=p)
    words = np.array([f"w{i}" for i in range(V)])
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(words[toks[offs[i]:offs[i + 1]]])
             for i in range(n_doc)]
    print(f"heaps: T={T} tokens, V={V} types, "
          f"observed_types={len(np.unique(toks))}")
else:
    sys.exit(f"unknown mode: {MODE} (want 'bounded' or 'heaps')")
for i in range(0, n_doc, 500):  # exact-dup structure for the dedup family
    if i + 1 < n_doc:
        texts[i + 1] = texts[i]
pq.write_table(pa.table({
    "doc_id": pa.array(range(n_doc), pa.int64()),
    "text": texts,
    "lang": [LANGS[i] for i in R2.integers(0, 5, n_doc)],
    "source": [f"src{i}" for i in R2.integers(0, 20, n_doc)],
    "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
    f"{OUT}/documents.parquet")
print("done", MODE, n_doc, OUT)
