"""BPE tokenizer: merge learning on the word-frequency table, rank-order
inference, corpus-scale shape."""

import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.functions.bpe import (
    bpe_encode,
    learn_bpe_merges,
    word_frequencies,
)


@pytest.fixture(scope="module")
def tiny_corpus(spark):
    rows = [
        (1, "low low low low low"),
        (2, "lower lower newest newest"),
        (3, "newest newest newest newest"),
        (4, "widest widest"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_learned_merges_greedy_order(spark, tiny_corpus):
    wf = word_frequencies(tiny_corpus)
    merges = learn_bpe_merges(wf, n_merges=4)
    # classic Sennrich example shape: 'es' (in newest×6 + widest×2 = 8)
    # is the most frequent pair, then 'est' composes
    assert merges[0] == ("e", "s")
    assert ("es", "t") in merges
    assert len(merges) == 4


def test_encode_applies_merges_in_rank_order(spark, tiny_corpus):
    wf = word_frequencies(tiny_corpus)
    merges = learn_bpe_merges(wf, n_merges=6)
    out = bpe_encode(tiny_corpus, merges).toPandas().set_index("doc_id")
    # every document round-trips: concatenated tokens == concatenated words
    raw = {r.doc_id: "".join(r.text.split()) for r in tiny_corpus.collect()}
    for doc_id, row in out.iterrows():
        assert "".join(row.bpe_tokens) == raw[doc_id]
        assert row.n_bpe_tokens == len(row.bpe_tokens)
    # merged units actually appear (fewer tokens than characters)
    assert (out.n_bpe_tokens < [len(raw[i]) for i in out.index]).all()


def test_encode_no_merges_is_chars(spark, tiny_corpus):
    out = bpe_encode(tiny_corpus.limit(1), []).toPandas()
    assert list(out.bpe_tokens[0])[:3] == ["l", "o", "w"]


def test_merges_deterministic_across_partitionings(spark, tiny_corpus):
    a = learn_bpe_merges(word_frequencies(tiny_corpus), n_merges=5)
    b = learn_bpe_merges(
        word_frequencies(tiny_corpus.repartition(7)), n_merges=5
    )
    assert a == b


def test_real_corpus_compresses(spark, docs):
    wf = word_frequencies(docs)
    merges = learn_bpe_merges(wf, n_merges=30)
    enc = bpe_encode(docs.limit(50), merges)
    stats = enc.agg(
        F.sum("n_bpe_tokens").alias("bpe"),
    ).first()
    chars = (
        docs.limit(50)
        .select(F.sum(F.length(F.regexp_replace("text", r"\s+", ""))).alias("c"))
        .first()
    )
    # 30 merges must compress well below character-level tokenization
    assert stats.bpe < 0.9 * chars.c
