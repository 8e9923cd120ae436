"""examples/crawl_curation.py stays runnable and honest: the composed
streaming lane gates fetch status, collapses re-crawled URLs, drops
textual near-copies, and lands the narrow key sidecars."""

import pytest

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
    ),
)


@pytest.mark.slow
def test_crawl_curation_example(spark):
    from crawl_curation import run

    out = run(spark)
    # batch 1: doc 1 wins pageA, doc 2 loses it, doc 6 was a 404
    assert out["landed_batch1"] == [1]
    # batch 2: doc 3 hits the landed URL, doc 4 is a near-copy of doc
    # 1's text, doc 5 is genuinely new
    assert out["landed_final"] == [1, 5], out["landed_final"]
    assert out["ids_sidecars"] >= 1
    # stage 7: the site-wide footer survived whole-doc dedup in BOTH
    # landed pages; span removal cut all 9 footer words from each, the
    # distinct page bodies stayed, and both docs packed
    from crawl_curation import BOILER, DOC_FOX, DOC_KAFKA

    n_boiler = len(BOILER.split())
    assert set(out["cleaned"]) == {1, 5}
    for doc_id, body in ((1, DOC_FOX), (5, DOC_KAFKA)):
        n_removed, text = out["cleaned"][doc_id]
        assert n_removed == n_boiler, (doc_id, n_removed)
        assert BOILER not in text and text == body.lower()
    assert out["packed_docs"] == 2
