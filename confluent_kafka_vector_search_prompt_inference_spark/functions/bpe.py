"""Byte-pair-encoding tokenizer: learn merges at corpus scale, apply
them as an Arrow map pass.

The scale observation every production BPE trainer uses (Sennrich et
al., "Neural Machine Translation of Rare Words with Subword Units", ACL
2016): merge learning never needs the corpus — only the distinct-word
frequency table, which is vocabulary-sized (Heaps' law: ~10⁵–10⁶ rows
for 100 TB of text). So the Spark shape is:

- ONE corpus pass: ``explode(tokens) → groupBy(word).count()`` — the
  only stage that touches corpus bytes, partial-aggregated map-side.
- Learning: collect the bounded word-frequency table and run the greedy
  merge loop driver-side in pure Python — each round re-counts adjacent
  pairs over ≤ |vocab| short symbol lists, milliseconds per round; a
  distributed version would pay a full job per merge for no quality
  difference (same rationale as the PQ/IVF sampled trainers).
- Encoding: merges broadcast via closure; ``mapInPandas`` applies them
  per document — embarrassingly parallel, zero shuffle.

Determinism: pair counts are exact integers; ties break on the pair's
(left, right) lexicographic order, so the learned merge list is a pure
function of the corpus.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

from confluent_kafka_vector_search_prompt_inference_spark.functions.text import word_tokens


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The vocabulary-sized ``(word, freq)`` table — BPE's only corpus pass."""
    return (
        docs.select(F.explode(word_tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def learn_bpe_merges(
    word_freq: DataFrame, n_merges: int = 50, max_vocab_rows: int = 1_000_000
) -> list[tuple[str, str]]:
    """Greedy BPE merge list from the word-frequency table.

    ``max_vocab_rows`` guards the driver collect: learning only needs the
    frequency HEAD of the vocabulary (rare-tail words contribute nothing
    to argmax pair counts), so the table is taken in deterministic
    ``(freq DESC, word ASC)`` order.
    """
    rows = (
        word_freq.orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(max_vocab_rows)
        .collect()
    )
    segs: list[tuple[list[str], int]] = [(list(r.word), int(r.freq)) for r in rows]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, freq in segs:
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        # ties: highest count, then lexicographically smallest pair
        top_count = max(counts.values())
        best_pair = min(p for p, c in counts.items() if c == top_count)
        if top_count < 2:
            break
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        nxt: list[tuple[list[str], int]] = []
        for sym, freq in segs:
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt.append((out, freq))
        segs = nxt
    return merges


def _apply_merges(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word)
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id_col, bpe_tokens ARRAY<STRING>, n_bpe_tokens)`` per document.

    Merges apply in learned-rank order per word (the standard BPE
    inference rule), inside one Arrow-batched ``mapInPandas`` — merges
    ride the closure (tokenizers are KBs), nothing shuffles.
    """
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    id_type = docs.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("bpe_tokens", ArrayType(StringType())),
            StructField("n_bpe_tokens", LongType()),
        ]
    )
    toks = docs.select(id_col, word_tokens(text_col).alias("__w"))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, out_toks, out_n = [], [], []
            for rid, words in zip(pdf[id_col], pdf["__w"]):
                enc: list[str] = []
                for w in words:
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = _apply_merges(w, ranks)
                        if len(cache) < 200_000:  # bound per-task memory
                            cache[w] = got
                    enc.extend(got)
                ids.append(rid)
                out_toks.append(enc)
                out_n.append(len(enc))
            yield pd.DataFrame(
                {id_col: ids, "bpe_tokens": out_toks, "n_bpe_tokens": out_n}
            )

    return toks.mapInPandas(encode, out_schema)
