"""examples/crawl_curation.py stays runnable and honest: the composed
streaming lane gates fetch status, collapses re-crawled URLs, drops
textual near-copies, and lands the narrow key sidecars."""

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
    ),
)


def test_crawl_curation_example(spark):
    from crawl_curation import run

    out = run(spark)
    # batch 1: doc 1 wins pageA, doc 2 loses it, doc 6 was a 404
    assert out["landed_batch1"] == [1]
    # batch 2: doc 3 hits the landed URL, doc 4 is a near-copy of doc
    # 1's text, doc 5 is genuinely new
    assert out["landed_final"] == [1, 5], out["landed_final"]
    assert out["ids_sidecars"] >= 1
