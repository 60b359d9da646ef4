#!/usr/bin/env python3
"""Generate the 10x documents/embeddings fixture tier (fixtures/sf1_docs).

The driver's testdata tops out at sf0.1 (5,000 docs / 2,000 vectors),
so every scale claim above that was analytical. This produces a tier
with the SAME statistical shape as the driver's documents/embeddings
tables, 10x the rows, so the dedup/ANN family's cost curves can be
MEASURED (ScalingBench -> SCALING.md):

- documents: 50,000 rows. Same 30-word uniform vocabulary, 10-100
  words/doc, lang mix en .41 / {zh,es,fr,de} ~.1475, sources src0-19.
  ~5%% of docs are near-duplicates of an earlier doc (copy, ~1 word
  replaced by the "dup" marker token, same lang - the structure
  observed in the driver data: 250/5000 docs, 255 "dup" tokens, pairs
  share lang), and ~0.16%% are exact duplicates (8/5000 observed).
- embeddings: 20,000 rows. Random L2-normalized 64-dim float vectors,
  labels uniform 0..9 - the driver's vectors are NOT clustered
  (within-label mean cos ~= 0; the cos>=0.35 pairs are the Gaussian
  tail, ~0.21%% of pairs), so random is the faithful shape.

Deterministic: seed 1006. Output is written once and committed-as-built
is NOT needed (the repo carries the generator; the driver's read-only
testdata is untouched).
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "sf1_docs")
N_DOCS = 50_000
N_VECS = 20_000
DIM = 64
rng = np.random.RandomState(1006)

VOCAB = ["spark", "window", "merge", "table", "column", "vector", "stream",
         "value", "data", "small", "join", "filter", "big", "group", "hash",
         "customer", "sort", "order", "slow", "line", "part", "fast", "the",
         "row", "agg", "key", "query", "a", "scan", "batch"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]

docs = []  # (text_words, lang)
texts, langs, sources = [], [], []
for i in range(N_DOCS):
    r = rng.rand()
    if i > 10 and r < 0.0016:            # exact duplicate of an earlier doc
        j = rng.randint(0, i)
        words, lang = docs[j]
        words = list(words)
    elif i > 10 and r < 0.05 + 0.0016:   # near-duplicate: ~1 word -> "dup"
        j = rng.randint(0, i)
        words, lang = docs[j]
        words = list(words)
        words[rng.randint(0, len(words))] = "dup"
        if rng.rand() < 0.02:
            words[rng.randint(0, len(words))] = "dup"
    else:
        n = rng.randint(10, 101)
        words = [VOCAB[k] for k in rng.randint(0, len(VOCAB), n)]
        lang = LANGS[int(rng.choice(len(LANGS), p=LANG_P))]
    docs.append((words, lang))
    texts.append(" ".join(words))
    langs.append(lang)
    sources.append(f"src{rng.randint(0, 20)}")

t = pa.table({
    "doc_id": pa.array(range(N_DOCS), pa.int64()),
    "text": pa.array(texts, pa.string()),
    "lang": pa.array(langs, pa.string()),
    "source": pa.array(sources, pa.string()),
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
pq.write_table(t, os.path.join(OUT, "documents.parquet"), row_group_size=5000)
pq.write_table(e, os.path.join(OUT, "embeddings.parquet"), row_group_size=2000)
print(f"wrote {N_DOCS} docs / {N_VECS} vecs to {OUT}")
