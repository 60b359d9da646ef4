#!/usr/bin/env python3
"""Generate the 100x documents/embeddings fixture tier (fixtures/sf10_docs).

Round-9 task (VERDICT r8 #1): the dedup/LSH/ANN/text family's scale
claims rested on the single 10x tier (fixtures/sf1_docs), and round 8
proved a second decade can MOVE an exponent (EDGES 0.87 -> ~1.0 on the
10x -> 100x leg). This produces the 100x point — 500,000 docs /
200,000 vectors — as a shape continuation of scripts/gen_sf1_docs.py
(same 30-word vocabulary, 10-100 words/doc, same lang mix, same
near-dup structure: ~5% near-dups with the "dup" marker token, ~0.16%
exact dups, sources src0-19), so ScalingBench can fit 3-point curves
sf0.01 -> sf1_docs -> sf10_docs for minhash-LSH banding, one-sided
containment sketches, ANN probing, and the text-analysis family.

The doc loop is vectorized (per-doc word draws batched via a single
randint matrix + per-row trim) — the sf1 generator's one-at-a-time
join would take minutes at 500k docs.

Deterministic: seed 1009. Output ~120 MB; .gitignored for size, the
repo carries the generator.
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "sf10_docs")
N_DOCS = 500_000
N_VECS = 200_000
DIM = 64
rng = np.random.RandomState(1009)

VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "the",
         "row", "agg", "key", "query", "a", "scan", "batch"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]

# fresh-doc material, drawn in one batch: word-index matrix + lengths
lens = rng.randint(10, 101, N_DOCS)
widx = rng.randint(0, len(VOCAB), (N_DOCS, 100))
lang_draw = rng.choice(len(LANGS), N_DOCS, p=LANG_P)
kind = rng.rand(N_DOCS)           # <0.0016 exact dup, <0.0516 near dup
dup_src = rng.rand(N_DOCS)        # fraction into the prior range
dup_pos = rng.rand(N_DOCS)        # marker position fraction
dup_two = rng.rand(N_DOCS) < 0.02 # second marker
src_draw = rng.randint(0, 20, N_DOCS)

docs = []   # (words, lang) — kept so dups copy an earlier doc
texts, langs = [], []
for i in range(N_DOCS):
    if i > 10 and kind[i] < 0.0016:
        j = int(dup_src[i] * i)
        words, lang = docs[j]
        words = list(words)
    elif i > 10 and kind[i] < 0.05 + 0.0016:
        j = int(dup_src[i] * i)
        words, lang = docs[j]
        words = list(words)
        words[int(dup_pos[i] * len(words))] = "dup"
        if dup_two[i]:
            words[int(dup_src[i] * len(words))] = "dup"
    else:
        words = [VOCAB[k] for k in widx[i, :lens[i]]]
        lang = LANGS[lang_draw[i]]
    docs.append((words, lang))
    texts.append(" ".join(words))
    langs.append(lang)

t = pa.table({
    "doc_id": pa.array(range(N_DOCS), pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(langs, pa.string()),
    "source": pa.array([f"src{s}" for s in src_draw], pa.string()),
    "n_chars": pa.array([len(s) for s in texts], pa.int64()),
})

V = rng.randn(N_VECS, DIM).astype(np.float32)
V /= np.linalg.norm(V, axis=1, keepdims=True)
e = pa.table({
    "vec_id": pa.array(range(N_VECS), pa.int64()),
    "embedding": pa.array([v for v in V.tolist()], pa.list_(pa.float32())),
    "label": pa.array(rng.randint(0, 10, N_VECS), pa.int32()),
})

os.makedirs(OUT, exist_ok=True)
# row_group_size: a single-row-group file is UNSPLITTABLE for Spark
# (one partition pins every downstream broadcast-join stage to one
# task); ~10 groups make the tier read with real parallelism
pq.write_table(t, os.path.join(OUT, "documents.parquet"), row_group_size=50000)
pq.write_table(e, os.path.join(OUT, "embeddings.parquet"), row_group_size=20000)
print(f"wrote {N_DOCS} docs / {N_VECS} vecs to {OUT}")
