"""Line-level boilerplate removal + Gopher repetition signals.

Hand-computed fixtures (every expected value derived on paper in the
comments) plus a brute-force Python mirror over a deterministic corpus,
and a plan assertion that the whole family stays UDF-free."""

import pytest

from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.repetition import (
    gopher_repetition_signals,
    remove_repeated_lines,
)


def _rows(df, key="doc_id"):
    return {r[key]: r.asDict() for r in df.collect()}


# ---------------------------------------------------------------------------
# remove_repeated_lines
# ---------------------------------------------------------------------------

def test_repeated_lines_grouped_removal(spark):
    # site A: header in 3/3 docs (frac 1.0 >= 0.5, dc 3 >= 2) -> removed;
    # "shared" in 2/3 (0.67 >= 0.5) -> removed; unique lines kept.
    # site B: its own header repeats in 2/2 -> removed there only; the
    # SAME literal line "header" under A and B is counted per-group.
    rows = [
        (1, "A", "header\nalpha\nshared"),
        (2, "A", "header\nshared\nbeta"),
        (3, "A", "header\ngamma"),
        (4, "B", "header\ndelta"),
        (5, "B", "header\nepsilon"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "site", "text"])
    out = _rows(
        remove_repeated_lines(
            df, "doc_id", "text", group_cols=["site"], min_docs=2, max_doc_frac=0.5
        )
    )
    assert out[1]["cleaned_text"] == "alpha"
    assert out[2]["cleaned_text"] == "beta"
    assert out[3]["cleaned_text"] == "gamma"
    assert out[4]["cleaned_text"] == "delta"
    assert out[5]["cleaned_text"] == "epsilon"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 2
    assert out[3]["n_kept"] == 1


def test_repeated_lines_order_and_full_removal(spark):
    # doc 2 is ALL boilerplate -> survives as an empty row; doc 1 keeps
    # its unique lines in original order.
    rows = [
        (1, "nav\none\nfooter\ntwo"),
        (2, "nav\nfooter"),
        (3, "nav\nthree\nfooter"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = _rows(
        remove_repeated_lines(df, "doc_id", "text", min_docs=2, max_doc_frac=0.5)
    )
    assert out[1]["cleaned_text"] == "one\ntwo"
    assert out[2]["cleaned_text"] == "" and out[2]["n_kept"] == 0
    assert out[3]["cleaned_text"] == "three"
    assert len(out) == 3


def test_repeated_lines_thresholds(spark):
    # "dup" sits in 2/10 docs: dc=2 passes min_docs but 0.2 < 0.25 frac
    # -> kept. At max_doc_frac=0.2 it is removed. min_docs dominates at
    # a tiny frac: frac=0.0 still needs dc >= min_docs.
    rows = [(i, f"dup\nu{i}" if i < 2 else f"only\nu{i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = _rows(remove_repeated_lines(df, max_doc_frac=0.25))
    assert kept[0]["cleaned_text"] == "dup\nu0"
    cut = _rows(remove_repeated_lines(df, max_doc_frac=0.2))
    assert cut[0]["cleaned_text"] == "u0"
    high_min = _rows(remove_repeated_lines(df, min_docs=9, max_doc_frac=0.0))
    assert high_min[0]["cleaned_text"] == "dup\nu0"  # dc=2 < 9
    # "only" appears in docs 2..9 -> dc=8 < 9 -> kept
    assert high_min[2]["cleaned_text"] == "only\nu2"


def test_repeated_lines_null_group_key(spark):
    # null group keys form ONE group (null-safe equality): the repeated
    # line under null is removed, not silently dropped or kept.
    rows = [
        (1, None, "ad\nx"),
        (2, None, "ad\ny"),
        (3, "s", "ad\nz"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "src", "text"])
    out = _rows(
        remove_repeated_lines(
            df, group_cols=["src"], min_docs=2, max_doc_frac=0.5
        )
    )
    assert out[1]["cleaned_text"] == "x"
    assert out[2]["cleaned_text"] == "y"
    assert out[3]["cleaned_text"] == "ad\nz"  # alone in group "s"


def test_repeated_lines_plan_udf_free(spark):
    df = spark.createDataFrame([(1, "s", "a\nb")], ["doc_id", "src", "text"])
    plan = (
        remove_repeated_lines(df, group_cols=["src"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastExchange" in plan  # the |groups|-row totals


def test_repeated_lines_validation(spark):
    df = spark.createDataFrame([(1, "t")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        remove_repeated_lines(df, min_docs=0)
    with pytest.raises(ValueError):
        remove_repeated_lines(df, max_doc_frac=1.5)


# ---------------------------------------------------------------------------
# gopher_repetition_signals
# ---------------------------------------------------------------------------

def test_gopher_hand_computed(spark):
    # doc 1: "a b a b a b" -> 6 words, 6 chars, distinct 2/6;
    #   top-2-gram "a b" occurs 3x, 2 chars -> 3*2/6 = 1.0;
    #   top-3-gram "a b a" 2x (also "b a b" 2x), 3 chars -> 6/6 = 1.0;
    #   no 5-gram repeats (grams "a b a b a", "b a b a b" once) -> 0.0.
    # doc 2: "x y z w v" * 3 -> the 5-gram "x y z w v" occurs 3x
    #   (every doc position covered) -> dup5 = 1.0.
    # doc 3: all-distinct words -> every signal low, not repetitive.
    rows = [
        (1, "a b a b a b"),
        (2, "x y z w v x y z w v x y z w v"),
        (3, "ab cd ef gh ij kl mn op qr st uv wx yz ba dc fe hg ji lk nm"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = _rows(gopher_repetition_signals(df))
    d1 = out[1]
    assert d1["n_words"] == 6 and d1["n_distinct_words"] == 2
    assert d1["top2gram_char_frac"] == 1.0
    assert d1["top3gram_char_frac"] == 1.0
    assert d1["dup5gram_char_frac"] == 0.0
    assert d1["repetitive"] is True
    d2 = out[2]
    assert d2["dup5gram_char_frac"] == 1.0 and d2["repetitive"] is True
    d3 = out[3]
    assert d3["distinct_word_frac"] == 1.0
    # 20 distinct 2-char words, 40 chars: every 2-gram once -> top2 =
    # 4/40 = 0.1 <= 0.20, top3 = 6/40 = 0.15 <= 0.18, dup5 = 0.
    assert d3["top2gram_char_frac"] == 0.1
    assert d3["top3gram_char_frac"] == 0.15
    assert d3["repetitive"] is False


def test_gopher_partial_dup_coverage(spark):
    # "p q r s t u p q r s t u zz" (13 words): 5-gram "p q r s t"
    # occurs at pos 0 and 6; "q r s t u" at 1 and 7 -> covered word
    # positions 0..11 (12 words of 1 char each), "zz" (2 chars) not
    # covered -> dup5 = 12 / 14.
    df = spark.createDataFrame(
        [(1, "p q r s t u p q r s t u zz")], ["doc_id", "text"]
    )
    out = _rows(gopher_repetition_signals(df))
    assert out[1]["dup5gram_char_frac"] == round(12 / 14, 6)


def _brute_signals(text, top_ns=(2, 3), dup_n=5):
    words = text.lower().split()
    chars = sum(len(w) for w in words)
    sig = {}
    for n in top_ns:
        grams = {}
        for i in range(max(len(words) - n + 1, 0)):
            g = " ".join(words[i : i + n])
            grams[g] = grams.get(g, 0) + 1
        sig[f"top{n}"] = round(
            max(
                (c * len(g.replace(" ", "")) for g, c in grams.items()),
                default=0,
            )
            / chars,
            6,
        ) if chars else 0.0
    occ = {}
    for i in range(max(len(words) - dup_n + 1, 0)):
        g = " ".join(words[i : i + dup_n])
        occ.setdefault(g, []).append(i)
    covered = set()
    for g, starts in occ.items():
        if len(starts) >= 2:
            for s in starts:
                covered.update(range(s, s + dup_n))
    sig["dup"] = round(
        sum(len(words[p]) for p in covered) / chars, 6
    ) if chars else 0.0
    return sig


def test_gopher_matches_bruteforce(spark):
    # deterministic pseudo-random corpus (seeded) cross-checked against
    # the plain-Python mirror above.
    import random

    rng = random.Random(7)
    vocab = ["aa", "b", "ccc", "dd", "e", "fff", "gg"]
    rows = []
    for d in range(12):
        n = rng.randrange(3, 40)
        words = [rng.choice(vocab) for _ in range(n)]
        if d % 3 == 0 and n > 12:  # plant a repeated block
            words[6:12] = words[0:6]
        rows.append((d, " ".join(words)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = _rows(gopher_repetition_signals(df))
    for d, text in rows:
        exp = _brute_signals(text)
        assert out[d]["top2gram_char_frac"] == exp["top2"], (d, text)
        assert out[d]["top3gram_char_frac"] == exp["top3"], (d, text)
        assert out[d]["dup5gram_char_frac"] == exp["dup"], (d, text)


def test_gopher_short_doc_and_plan(spark):
    # shorter than every gram width: zero fractions, nothing crashes.
    df = spark.createDataFrame([(1, "solo")], ["doc_id", "text"])
    out = _rows(gopher_repetition_signals(df))
    assert out[1]["top2gram_char_frac"] == 0.0
    assert out[1]["dup5gram_char_frac"] == 0.0
    assert out[1]["repetitive"] is False
    plan = (
        gopher_repetition_signals(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
