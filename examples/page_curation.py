"""Line-level boilerplate removal + repetition gates, end to end.

Whole-document dedup can't touch a nav bar (every page carrying it is
otherwise distinct), span removal works at 5-gram granularity (a
3-word banner never forms a repeated 5-gram with its changing
neighbors), and length/stopword quality gates wave keyword-stuffed
spam straight through. The round-12 repetition family
(``operators/repetition.py``) closes both holes:

1. **per-site line dedup** — ``remove_repeated_lines(group_cols=
   ['site'])`` counts each line's distinct documents WITHIN its site
   and cuts the ones above the fraction gate: nav headers, cookie
   banners, copyright footers fall; a body line quoted by two pages
   stays (below the gate). The same literal line on ANOTHER site is
   counted separately — one site's boilerplate is another's content.
2. **Gopher repetition gates** — ``gopher_repetition_signals`` scores
   the CLEANED text: fraction of characters in the most frequent
   2-/3-gram, fraction covered by duplicated 5-grams (Rae et al.
   2021 A1.1). The keyword-stuffed page trips the gate; prose passes.

``python examples/page_curation.py`` prints each page before/after and
the per-page verdicts. The oracled batch queries are
``__spark_entry__.line_boilerplate_removal`` /
``gopher_repetition_quality`` / ``page_curation_pipeline`` (the whole
chain re-run closed-form in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

NAV = "home products pricing contact careers"
COOKIES = "we use cookies to improve your browsing experience"
FOOTER = "copyright example corp all rights reserved"

PROSE_A = (
    "the merge scheduler bounds rewrite amplification by folding "
    "delta files geometrically so each landed byte is copied at most "
    "a logarithmic number of times over the full history of the store"
)
PROSE_B = (
    "watermarks let the engine retire window state once event time "
    "has provably passed so unbounded streams aggregate in bounded "
    "memory without dropping late arrivals inside the allowance"
)
SPAM = "buy cheap tokens " * 12 + "best cheap tokens deal"


def run(spark: SparkSession, verbose: bool = False) -> dict:
    from confluent_kafka_vector_search_prompt_inference_spark.operators.repetition import (
        gopher_repetition_signals,
        remove_repeated_lines,
    )

    pages = spark.createDataFrame(
        [
            # site A: three pages sharing nav + footer; two also show the
            # cookie banner (2/3 >= the 0.5 gate)
            (1, "a", "\n".join([NAV, PROSE_A, COOKIES, FOOTER])),
            (2, "a", "\n".join([NAV, PROSE_B, COOKIES, FOOTER])),
            (3, "a", "\n".join([NAV, SPAM, FOOTER])),
            # site B: ONE page whose body happens to quote site A's nav
            # line — under per-site counting it is content here, kept
            (4, "b", "\n".join([NAV, PROSE_B]))
        ],
        ["doc_id", "site", "text"],
    )
    cleaned = remove_repeated_lines(
        pages, "doc_id", "text",
        group_cols=["site"], min_docs=2, max_doc_frac=0.5,
    )
    sig = gopher_repetition_signals(
        cleaned.selectExpr("doc_id", "cleaned_text AS text")
    )
    out = {
        "cleaned": {
            r.doc_id: (r.n_removed, r.cleaned_text) for r in cleaned.collect()
        },
        "verdicts": {
            r.doc_id: (round(r.top2gram_char_frac, 3), bool(r.repetitive))
            for r in sig.collect()
        },
    }
    if verbose:
        for d in sorted(out["cleaned"]):
            n_removed, text = out["cleaned"][d]
            top2, rep = out["verdicts"][d]
            print(f"doc {d}: cut {n_removed} boilerplate lines; "
                  f"top2gram {top2}; repetitive={rep}")
            print(f"  -> {text!r}")
    return out


if __name__ == "__main__":
    from confluent_kafka_vector_search_prompt_inference_spark import get_spark

    spark = get_spark("page-curation-example")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, verbose=True)
