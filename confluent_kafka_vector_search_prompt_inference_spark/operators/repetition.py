"""Repetition-centric curation: line-level boilerplate removal and
Gopher-style repetition signals.

Not in the reference (SURVEY.md §2.11 — mandated extension surface);
both are standard passes in web-scale training-data pipelines:

- :func:`remove_repeated_lines` — the CCNet / RefinedWeb line-level
  dedup (Wenzek et al. 2019; Penedo et al. 2023 §3): a line that
  repeats across many documents of the same site/domain is navigation,
  cookie banners, copyright footers — boilerplate the whole-document
  and span-level passes cannot express at the right granularity (a
  nav bar is too short for a 5-gram span to reliably cover, and it
  never makes two documents near-duplicates on its own).
- :func:`gopher_repetition_signals` — the per-document repetition
  quality rules of Gopher (Rae et al. 2021, appendix A1.1): fraction
  of characters in the most frequent word n-gram, fraction of
  characters covered by duplicated n-grams, distinct-word fraction.
  These gate pathological pages (keyword stuffing, templated spam)
  that pass length/stopword gates.

Scale notes: everything is pure Catalyst — zero Python UDFs. Line
counting shuffles ``(group, line)`` keyed rows (line-scale, like the
span family's gram-scale exchanges — never doc pairs); per-group
document totals are a ``|groups|``-row aggregate joined back with a
broadcast hint. The Gopher signals shuffle ``(doc, gram)`` pairs with
map-side partial aggregation and reduce to one row per document; no
window over the corpus, no driver state.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.functions.text import word_tokens
from confluent_kafka_vector_search_prompt_inference_spark.operators.dedup import (
    gram_occurrences,
    span_tokenized,
)


# ---------------------------------------------------------------------------
# line-level boilerplate removal (CCNet / RefinedWeb)
# ---------------------------------------------------------------------------

def remove_repeated_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    group_cols: list[str] | None = None,
    min_docs: int = 2,
    max_doc_frac: float = 0.5,
    line_sep: str = "\n",
) -> DataFrame:
    """Remove lines that repeat across documents of the same group.

    A line is boilerplate within its group (e.g. ``group_cols=
    ['source']`` for per-site removal; ``None`` = whole corpus) when it
    appears in at least ``min_docs`` distinct documents AND in at least
    ``max_doc_frac`` of the group's documents. Surviving lines are
    reassembled in original order. Line identity is the exact line
    string (callers wanting fuzzier matching normalize ``text_col``
    first).

    Returns one row per input document:
    ``(id_col, n_lines, n_kept, n_removed, cleaned_text)`` — a fully
    boilerplate document keeps its row with ``cleaned_text = ''``.
    ``id_col`` must be unique (the reassembly groups by it — duplicated
    ids would interleave two documents' lines; the streaming face
    enforces this per batch with ``dropDuplicates``).

    Plan shape at 100 TB: one ``(group, line)``-keyed aggregate for the
    distinct-document counts (line-scale rows, map-side partials on the
    two-phase distinct), one broadcast of the ``|groups|``-row totals,
    one join of the line table against the counts on the same
    ``(group, line)`` key, and one ``groupBy(doc)`` reassembly with an
    in-row ``array_sort`` — no window over the corpus, no all-pairs
    product, document bodies cross the wire once as their lines.
    Group-key equality is NULL-SAFE throughout, so documents under a
    null group key form one group instead of vanishing."""
    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")
    if not (0.0 <= max_doc_frac <= 1.0):
        raise ValueError("max_doc_frac must be in [0, 1]")
    g = list(group_cols or [])

    base = df.select(
        F.col(id_col).alias("__id"),
        *[F.col(c) for c in g],
        F.split(F.col(text_col), re.escape(line_sep)).alias("__ls"),
    )
    lines = base.select(
        "__id", *g, F.posexplode("__ls").alias("__pos", "__line")
    )

    counts = (
        lines.groupBy(*g, "__line")
        .agg(F.count_distinct("__id").alias("__dc"))
        .select(
            *[F.col(c).alias(f"__k_{c}") for c in g],
            F.col("__line").alias("__kline"),
            "__dc",
        )
    )
    totals = F.broadcast(
        base.groupBy(*[F.col(c).alias(f"__t_{c}") for c in g]).agg(
            F.count("*").alias("__nd")
        )
    )

    cnt_cond = [lines["__line"] == counts["__kline"]] + [
        lines[c].eqNullSafe(counts[f"__k_{c}"]) for c in g
    ]
    joined = lines.join(counts, cnt_cond, "inner")
    if g:
        tot_cond = [lines[c].eqNullSafe(totals[f"__t_{c}"]) for c in g]
        joined = joined.join(totals, tot_cond, "inner")
    else:
        joined = joined.crossJoin(totals)

    bp = (F.col("__dc") >= F.lit(min_docs)) & (
        F.col("__dc").cast("double")
        >= F.col("__nd").cast("double") * F.lit(float(max_doc_frac))
    )
    out = (
        joined.withColumn("__bp", bp)
        .groupBy("__id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("__bp"), 1).otherwise(0)).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("__bp"),
                                F.struct(
                                    F.col("__pos").alias("p"),
                                    F.col("__line").alias("l"),
                                ),
                            )
                        )
                    ),
                    lambda s: s["l"],
                ),
                line_sep,
            ).alias("cleaned_text"),
        )
    )
    return out.select(
        F.col("__id").alias(id_col),
        F.col("n_lines").cast("bigint").alias("n_lines"),
        (F.col("n_lines") - F.col("n_removed")).cast("bigint").alias("n_kept"),
        F.col("n_removed").cast("bigint").alias("n_removed"),
        "cleaned_text",
    )


# ---------------------------------------------------------------------------
# Gopher repetition signals (Rae et al. 2021, appendix A1.1)
# ---------------------------------------------------------------------------

def _gram_col(toks: Column, n: int) -> Column:
    """Word ``n``-grams of a token array (empty array when too short)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def gopher_repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    top_ns: tuple[int, ...] = (2, 3),
    dup_n: int = 5,
    dup_min_count: int = 2,
    top_thresholds: dict[int, float] | None = None,
    dup_threshold: float = 0.15,
) -> DataFrame:
    """Per-document repetition quality signals (Gopher A1.1).

    For each ``n`` in ``top_ns``: ``top{n}gram_char_frac`` — characters
    of the single most frequent word ``n``-gram, counted over ALL its
    occurrences, as a fraction of the document's word characters
    (spaces excluded on both sides of the ratio). For ``dup_n``:
    ``dup{n}gram_char_frac`` — fraction of word characters covered by
    at least one ``dup_n``-gram occurring ``dup_min_count``+ times
    within the document (overlapping coverage counted once).
    ``distinct_word_frac`` — distinct words / words. ``repetitive`` is
    the published gate (defaults: top-2 > 0.20, top-3 > 0.18,
    dup-5 > 0.15), evaluated on the rounded fractions.

    Returns ``(id_col, n_words, n_distinct_words, distinct_word_frac,
    top{n}gram_char_frac …, dup{n}gram_char_frac, repetitive)``.
    ``id_col`` must be unique — duplicated ids would merge two
    documents' gram spaces.

    Plan shape at 100 TB: each signal is a ``(doc, gram)``-keyed
    aggregate reduced to one row per document and joined back on the
    document id — map-side partials everywhere, no corpus-wide window,
    no driver state. The dup-coverage pass reuses the span family's
    gram-occurrence explode and marks covered word positions with a
    ``(doc, pos)`` distinct, exactly the span-removal exchange shape."""
    thresholds = dict(top_thresholds or {2: 0.20, 3: 0.18})
    from confluent_kafka_vector_search_prompt_inference_spark.persist import track

    base = track(span_tokenized(df, id_col, text_col))
    words = base.select(
        "__id", F.posexplode("__toks").alias("__pos", "__w")
    )
    stats = words.groupBy("__id").agg(
        F.count("*").alias("n_words"),
        F.count_distinct("__w").alias("n_distinct_words"),
        F.sum(F.length("__w")).alias("__chars"),
    )

    out = stats
    for n in top_ns:
        top = (
            base.select("__id", F.explode(_gram_col(F.col("__toks"), n)).alias("__s"))
            .groupBy("__id", "__s")
            .agg(F.count("*").alias("__c"))
            .groupBy("__id")
            .agg(
                F.max(
                    F.col("__c") * F.length(F.translate("__s", " ", ""))
                ).alias(f"__top{n}")
            )
        )
        out = out.join(top, "__id", "left")

    occ = gram_occurrences(base, dup_n)
    dup = (
        occ.groupBy("__id", "__s")
        .agg(F.count("*").alias("__c"))
        .filter(F.col("__c") >= dup_min_count)
        .select("__id", "__s")
    )
    covered = (
        occ.join(dup, ["__id", "__s"], "leftsemi")
        .select(
            "__id",
            F.explode(
                F.sequence(F.col("__pos"), F.col("__pos") + (dup_n - 1))
            ).alias("__pos"),
        )
        .distinct()
    )
    dupchars = (
        covered.join(words, ["__id", "__pos"])
        .groupBy("__id")
        .agg(F.sum(F.length("__w")).alias("__dupchars"))
    )
    out = out.join(dupchars, "__id", "left")

    def frac(num: Column) -> Column:
        return F.round(
            F.when(
                F.col("__chars") > 0,
                F.coalesce(num, F.lit(0)).cast("double")
                / F.col("__chars").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        )

    top_cols = [
        frac(F.col(f"__top{n}")).alias(f"top{n}gram_char_frac") for n in top_ns
    ]
    dup_col = frac(F.col("__dupchars")).alias(f"dup{dup_n}gram_char_frac")
    result = out.select(
        F.col("__id").alias(id_col),
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("n_distinct_words").cast("bigint").alias("n_distinct_words"),
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.col("n_distinct_words").cast("double")
                / F.col("n_words").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("distinct_word_frac"),
        *top_cols,
        dup_col,
    )
    gate = F.lit(False)
    for n in top_ns:
        if n in thresholds:
            gate = gate | (
                F.col(f"top{n}gram_char_frac") > F.lit(float(thresholds[n]))
            )
    gate = gate | (F.col(f"dup{dup_n}gram_char_frac") > F.lit(float(dup_threshold)))
    return result.withColumn("repetitive", gate)
