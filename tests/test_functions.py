"""Column functions: json_object semantics, text analysis vs Python oracle."""

import json
import re

import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.functions.json_fns import json_object
from confluent_kafka_vector_search_prompt_inference_spark.functions.text import (
    EN_STOPWORDS,
    TOKEN_REGEX,
    doc_fingerprint,
    language_id,
    normalized_text,
    punct_ratio,
    stopword_ratio,
    token_count,
    word_tokens,
)


def test_json_object_returns_string(spark):
    """String-returning semantics (reference README.md:598)."""
    df = spark.createDataFrame([("user", "hi")], "role string, msg string")
    row = df.select(json_object(role="role", msg=F.col("msg")).alias("j")).first()
    assert isinstance(row.j, str)
    assert json.loads(row.j) == {"role": "user", "msg": "hi"}


def test_json_object_nested_cast_string(spark):
    """Nested values serialize structurally (README.md:726-730 pattern)."""
    df = spark.createDataFrame(
        [([{"content": "shoes"}],)], "products array<struct<content:string>>"
    )
    row = df.select(
        json_object(products=F.to_json(F.col("products"))).alias("j")
    ).first()
    body = json.loads(row.j)
    assert json.loads(body["products"]) == [{"content": "shoes"}]


@pytest.mark.parametrize(
    "text",
    [
        "The quick brown fox, it jumps!",
        "  MIXED   Case \t whitespace  ",
        "",
        "no-stopwords-here xyz",
    ],
)
def test_text_functions_vs_python(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        normalized_text("text").alias("norm"),
        word_tokens("text").alias("toks"),
        token_count("text").alias("ntok"),
        punct_ratio("text").alias("pr"),
        stopword_ratio("text").alias("sr"),
    ).first()
    norm = re.sub(r"\s+", " ", text.lower()).strip()
    assert row.norm == norm
    assert row.toks == norm.split(" ")
    assert row.ntok == len(re.findall(TOKEN_REGEX, text))
    n = len(text)
    p = len(re.findall(r"[.,;:!?'\"()\-]", text))
    assert row.pr == pytest.approx(p / n if n else 0.0)
    toks = norm.split(" ")
    hits = sum(1 for w in toks if w in EN_STOPWORDS)
    assert row.sr == pytest.approx(hits / len(toks) if toks else 0.0)


def test_language_id_english_vs_unknown(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat and it is happy",), ("xyzzy plugh abracadabra",),
         ("el gato es de la casa y es feliz",)],
        "text string",
    )
    out = [r.lang for r in df.select(language_id("text").alias("lang")).collect()]
    assert out == ["en", "unknown", "es"]


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("HELLO\tWORLD ",), ("different",)],
        "text string",
    )
    fps = [r.fp for r in df.select(doc_fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2] != fps[3]


def test_approx_count_distinct_accuracy(spark):
    """HLL++ sketch estimate stays within the configured rsd of the exact
    distinct count (the scale path for cardinality — mergeable, no
    distinct shuffle)."""
    from pyspark.sql import functions as F

    df = spark.range(0, 20000).select((F.col("id") % 7919).alias("k"))
    row = df.agg(
        F.approx_count_distinct("k", 0.02).alias("approx"),
        F.countDistinct("k").alias("exact"),
    ).first()
    assert row.exact == 7919
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_approx_percentile_within_tolerance(spark, sf_correct):
    """approx_percentile tracks the exact percentile within a few percent —
    the mergeable-sketch path for quantiles at 100 TB where exact
    percentile_cont would need a global sort."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_correct}/lineitem.parquet")
    row = li.agg(
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)").alias("approx"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("exact"),
    ).first()
    for a, e in zip(row.approx, row.exact):
        assert abs(a - e) / e < 0.05, (a, e)


def test_observation_metrics_single_pass(spark, sf_correct):
    """df.observe() collects pipeline metrics during the SAME action that
    produces the data — no second scan for row counts in a 100 TB job."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_correct}/lineitem.parquet")
    obs = Observation("ingest_metrics")
    observed = li.observe(
        obs, F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty")
    )
    out = observed.filter(F.col("l_discount") > 0.02).count()
    m = obs.get
    assert m["n"] == li.count()  # metrics cover pre-filter rows
    assert out < m["n"] and m["qty"] > 0


def test_hll_sketch_union_matches_exact_within_tolerance(spark, sf_correct):
    """Merging per-day HLL sketches estimates the monthly distinct count
    without rescanning history — the incremental/mergeable state pattern.
    The merged estimate must match a direct whole-range sketch and stay
    within HLL error of the exact count."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    out = entry.queries()["incremental_dau_hll"](spark, sf_correct).toPandas()
    # the query emits the tolerance verdict itself (within_bound: merged /
    # per-day HLL estimate within 5% of exact); every row must hold
    assert out.within_bound.all(), out[~out.within_bound]
    month = out[out.period == "month"]
    ev = entry._t(spark, sf_correct, "events")
    exact = ev.select(F.countDistinct("user_id").alias("n")).first()["n"]
    assert int(month.uniques_exact.iloc[0]) == exact
    # daily rows present alongside the merged row
    assert (out.period != "month").sum() >= 28


# ---------------------------------------------------------------------------
# Round 9: crawl-curation column functions


def test_html_to_text_strips_code_blocks_whole(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.functions.text import html_to_text

    cases = {
        "<p>Hello&nbsp;world</p>": "Hello world",
        "<SCRIPT>var x = '<b>not text</b>'</SCRIPT>tail": "tail",
        "<style>p { color: red }</style>body": "body",
        "<script>unclosed to the end": "",
        "a<!-- comment -->b": "a b",
        # a commented-out script tag (valid, common HTML) must be removed
        # AS the comment it is — stripping comments after the unclosed-
        # <script> fallback deleted everything from the comment onward
        "keep<!-- <script src='x.js'> -->this too": "keep this too",
        "keep<!-- <style> -->this too": "keep this too",
        # ...while a PAIRED script whose body contains comment markers
        # still goes whole (it is removed before comment stripping runs)
        "<script>// <!-- inline note --> code()</script>after": "after",
        "Two &gt; one &amp;lt; literal &#39;q&#39;": "Two > one &lt; literal 'q'",
        "plain text stays": "plain text stays",
        "": "",
    }
    df = spark.createDataFrame([(k,) for k in cases], "h string")
    got = {r["h"]: r["t"] for r in df.select("h", html_to_text("h").alias("t")).collect()}
    for h, want in cases.items():
        assert got[h] == want, (h, got[h])


def test_canonical_url_strips_trackers_preserving_real_params(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.functions.text import canonical_url

    cases = {
        "HTTPS://Example.ORG/Path?utm_source=x&page=2#frag":
            "https://example.org/Path?page=2",
        "http://a.b/x?gclid=g": "http://a.b/x",
        "http://a.b/x?p=1&utm_a=1&utm_b=2": "http://a.b/x?p=1",
        "http://a.b/x?p=1&fbclid=f&q=2": "http://a.b/x?p=1&q=2",
        "http://a.b/x?utm_a=1&p=1": "http://a.b/x?p=1",
        "https://E.org/CaseSensitive/Path": "https://e.org/CaseSensitive/Path",
        "no-scheme/relative?ref=abc&keep=1": "no-scheme/relative?keep=1",
        "http://a.b/": "http://a.b/",
    }
    df = spark.createDataFrame([(k,) for k in cases], "u string")
    got = {r["u"]: r["c"] for r in df.select("u", canonical_url("u").alias("c")).collect()}
    for u, want in cases.items():
        assert got[u] == want, (u, got[u])
