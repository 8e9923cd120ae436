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
        gen_relational(sf)




# --- relational tables (events / orders / lineitem) -----------------------
# Added in round 4 so the graph/time-series/RFM heavies can ladder too.
# Same 10x steps as documents: sf0.1 ships 100k events (1.5k users),
# 150k orders, 600k lineitem rows.

REL_SIZES = {
    "sf1": {"events": (1_000_000, 15_000), "orders": 1_500_000, "lineitem": 6_000_000},
    "sf10": {"events": (10_000_000, 150_000), "orders": 15_000_000, "lineitem": 60_000_000},
}
EVENT_TYPES = ["view", "click", "purchase", "error", "login"]
SPAN_SEC = 30 * 24 * 3600  # 30-day window like the driver testdata


def gen_events(n: int, n_users: int, out: str, seed: int = 44, chunk: int = 500_000) -> None:
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    writer = None
    try:
        for start in range(0, n, chunk):
            rows = min(chunk, n - start)
            # timestamps roughly ordered with jitter (like an ingest log)
            secs = (start + np.arange(rows)) * (SPAN_SEC / n) + rng.random(rows)
            ts = base + (secs * 1e6).astype("timedelta64[us]")
            tbl = pa.table(
                {
                    "event_id": pa.array(np.arange(start, start + rows), pa.int64()),
                    "ts": pa.array(ts, pa.timestamp("us")),
                    "user_id": pa.array(rng.integers(0, n_users, rows), pa.int64()),
                    "event_type": pa.array(
                        [EVENT_TYPES[i] for i in rng.integers(0, len(EVENT_TYPES), rows)],
                        pa.string(),
                    ),
                    "value": pa.array(np.round(rng.random(rows) * 500, 2), pa.float64()),
                    "props": pa.array(
                        [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, rows)],
                        pa.string(),
                    ),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(out, tbl.schema)
            writer.write_table(tbl)
    finally:
        if writer:
            writer.close()


def gen_orders(n: int, out: str, seed: int = 45, chunk: int = 500_000) -> None:
    rng = np.random.default_rng(seed)
    base = np.datetime64("1995-01-01T00:00:00", "us")
    statuses = ["O", "F", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    n_cust = max(1, n // 100)
    writer = None
    try:
        for start in range(0, n, chunk):
            rows = min(chunk, n - start)
            days = rng.integers(0, 2557, rows)  # 7-year span like TPC-H
            tbl = pa.table(
                {
                    "o_orderkey": pa.array(np.arange(start, start + rows), pa.int64()),
                    "o_custkey": pa.array(rng.integers(0, n_cust, rows), pa.int64()),
                    "o_orderstatus": pa.array(
                        [statuses[i] for i in rng.integers(0, 3, rows)], pa.string()
                    ),
                    "o_totalprice": pa.array(
                        np.round(rng.random(rows) * 400_000 + 1000, 2), pa.float64()
                    ),
                    "o_orderdate": pa.array(
                        base + (days * 86_400_000_000).astype("timedelta64[us]"),
                        pa.timestamp("us"),
                    ),
                    "o_orderpriority": pa.array(
                        [prios[i] for i in rng.integers(0, 5, rows)], pa.string()
                    ),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(out, tbl.schema)
            writer.write_table(tbl)
    finally:
        if writer:
            writer.close()


def gen_lineitem(n: int, n_orders: int, out: str, seed: int = 46, chunk: int = 1_000_000) -> None:
    """~4 lines per order; part keys zipf-ish (popular parts co-purchase
    often — the density the PageRank/co-purchase graph queries need)."""
    rng = np.random.default_rng(seed)
    base = np.datetime64("1995-01-01T00:00:00", "us")
    n_parts = max(1, n // 30)
    n_supp = max(1, n // 600)
    writer = None
    try:
        for start in range(0, n, chunk):
            rows = min(chunk, n - start)
            # zipf-ish part popularity, clipped into range
            parts = np.minimum(
                (rng.zipf(1.3, rows) - 1) % n_parts, n_parts - 1
            )
            tbl = pa.table(
                {
                    "l_orderkey": pa.array(
                        rng.integers(0, n_orders, rows), pa.int64()
                    ),
                    "l_partkey": pa.array(parts.astype(np.int64), pa.int64()),
                    "l_suppkey": pa.array(rng.integers(0, n_supp, rows), pa.int64()),
                    "l_linenumber": pa.array(
                        rng.integers(1, 8, rows).astype(np.int32), pa.int32()
                    ),
                    "l_quantity": pa.array(
                        rng.integers(1, 51, rows).astype(np.float64), pa.float64()
                    ),
                    "l_extendedprice": pa.array(
                        np.round(rng.random(rows) * 100_000 + 900, 2), pa.float64()
                    ),
                    "l_discount": pa.array(
                        np.round(rng.integers(0, 11, rows) / 100.0, 2), pa.float64()
                    ),
                    "l_tax": pa.array(
                        np.round(rng.integers(0, 9, rows) / 100.0, 2), pa.float64()
                    ),
                    "l_returnflag": pa.array(
                        [("A", "N", "R")[i] for i in rng.integers(0, 3, rows)],
                        pa.string(),
                    ),
                    "l_linestatus": pa.array(
                        [("F", "O")[i] for i in rng.integers(0, 2, rows)], pa.string()
                    ),
                    "l_shipdate": pa.array(
                        base
                        + (rng.integers(0, 2557, rows) * 86_400_000_000).astype(
                            "timedelta64[us]"
                        ),
                        pa.timestamp("us"),
                    ),
                }
            )
            if writer is None:
                writer = pq.ParquetWriter(out, tbl.schema)
            writer.write_table(tbl)
    finally:
        if writer:
            writer.close()


def gen_relational(sf: str) -> None:
    d = os.path.join(OUT_BASE, sf)
    os.makedirs(d, exist_ok=True)
    cfg = REL_SIZES[sf]
    n_ev, n_users = cfg["events"]
    print(f"{sf}: {n_ev} events, {cfg['orders']} orders, {cfg['lineitem']} lineitem")
    gen_events(n_ev, n_users, os.path.join(d, "events.parquet"))
    gen_orders(cfg["orders"], os.path.join(d, "orders.parquet"))
    gen_lineitem(cfg["lineitem"], cfg["orders"], os.path.join(d, "lineitem.parquet"))


if __name__ == "__main__":
    main()
