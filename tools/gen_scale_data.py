"""Generate sf1/sf10 documents + embeddings for empirical scale validation.

The driver testdata stops at sf0.1 (5k docs / 2k vectors); every 100 TB
claim in SCALING.md rested on plan inspection alone. This generator
extends the SAME distributional shape 10× and 100× so the heavy
dedup/retrieval queries can be RUN up the ladder (tools/scalecheck.py):

- documents: 31-word vocabulary, 10–100 tokens/doc, 5 langs, 20 sources,
  ~5% planted near-duplicates (mutated copy of an earlier doc, 'dup'
  marker token appended — matches the driver corpus) and ~0.2% exact
  duplicates. Near-dup structure is what gives MinHash/LSH/CC real work.
- embeddings: 64-dim unit vectors around 10 label centroids (driver
  corpus is unit-norm, 10 labels).

Deterministic (seed 42), written in chunks via pyarrow. Output goes to
.scaledata/sf{1,10}/ (gitignored — sf10 is ~1.6 GB).

Usage: python tools/gen_scale_data.py [sf1] [sf10]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "fr", "es", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]

# sf0.1 has 5k docs / 2k vectors → keep the 10× ladder
SIZES = {"sf1": (50_000, 20_000), "sf10": (500_000, 200_000)}

OUT_BASE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scaledata")


def gen_documents(n: int, out: str, seed: int = 42, chunk: int = 50_000) -> None:
    rng = np.random.default_rng(seed)
    writer = None
    # ring buffer of recent docs to clone near-dups from (bounded memory)
    recent: list[list[str]] = []
    try:
        for start in range(0, n, chunk):
            rows = min(chunk, n - start)
            ids, texts, langs, sources, n_chars = [], [], [], [], []
            lang_idx = rng.choice(len(LANGS), size=rows, p=LANG_P)
            kinds = rng.random(rows)
            for i in range(rows):
                doc_id = start + i
                if kinds[i] < 0.05 and recent:  # near-dup: mutate a recent doc
                    base = recent[rng.integers(len(recent))]
                    toks = list(base)
                    n_mut = max(1, len(toks) // 10)
                    for _ in range(n_mut):
                        toks[rng.integers(len(toks))] = VOCAB[rng.integers(len(VOCAB))]
                    toks.append("dup")
                elif kinds[i] < 0.052 and recent:  # exact duplicate
                    toks = list(recent[rng.integers(len(recent))])
                else:
                    n_tok = int(rng.integers(10, 101))
                    toks = [VOCAB[j] for j in rng.integers(0, len(VOCAB), n_tok)]
                    if len(recent) < 1000:
                        recent.append(toks)
                    else:
                        recent[doc_id % 1000] = toks
                text = " ".join(toks)
                ids.append(doc_id)
                texts.append(text)
                langs.append(LANGS[lang_idx[i]])
                sources.append(f"src{doc_id % 20}")
                n_chars.append(len(text))
            tbl = pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(langs, pa.string()),
                    "source": pa.array(sources, pa.string()),
                    "n_chars": pa.array(n_chars, pa.int64()),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(out, tbl.schema)
            writer.write_table(tbl)
    finally:
        if writer:
            writer.close()


def gen_embeddings(n: int, out: str, seed: int = 43, chunk: int = 100_000) -> None:
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    writer = None
    try:
        for start in range(0, n, chunk):
            rows = min(chunk, n - start)
            labels = rng.integers(0, 10, rows)
            vecs = 0.8 * cents[labels] + 0.6 * rng.standard_normal((rows, 64))
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
            vecs = vecs.astype(np.float32)
            tbl = pa.table(
                {
                    "vec_id": pa.array(np.arange(start, start + rows), pa.int64()),
                    "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                    "label": pa.array(labels.astype(np.int32), pa.int32()),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(out, tbl.schema)
            writer.write_table(tbl)
    finally:
        if writer:
            writer.close()


def main() -> None:
    targets = sys.argv[1:] or list(SIZES)
    for sf in targets:
        n_docs, n_vecs = SIZES[sf]
        d = os.path.join(OUT_BASE, sf)
        os.makedirs(d, exist_ok=True)
        print(f"{sf}: {n_docs} docs, {n_vecs} vectors -> {d}")
        gen_documents(n_docs, os.path.join(d, "documents.parquet"))
        gen_embeddings(n_vecs, os.path.join(d, "embeddings.parquet"))


if __name__ == "__main__":
    main()
