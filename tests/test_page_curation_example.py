"""examples/page_curation.py stays runnable and honest: per-site line
dedup cuts nav/banner/footer, keeps cross-site coincidences, and the
Gopher gate flags the keyword-stuffed page on its CLEANED text."""

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
    ),
)


def test_page_curation_example(spark):
    from page_curation import COOKIES, FOOTER, NAV, PROSE_A, PROSE_B, SPAM, run

    out = run(spark)
    cleaned = out["cleaned"]
    # site A: nav + footer in 3/3 pages, cookie banner in 2/3 — all cut;
    # each page keeps exactly its body line
    assert cleaned[1] == (3, PROSE_A)
    assert cleaned[2] == (3, PROSE_B)
    assert cleaned[3] == (2, SPAM)  # no cookie line on page 3
    # site B: the SAME nav line is content there (1/1 page, below
    # min_docs) — kept, in original order
    assert cleaned[4] == (0, "\n".join([NAV, PROSE_B]))
    for d in (1, 2, 4):
        _, text = cleaned[d]
        assert COOKIES not in text and FOOTER not in text
    # Gopher gate on the cleaned text: the stuffed page trips the
    # top-2-gram fraction, the prose pages pass
    verdicts = out["verdicts"]
    assert verdicts[3][1] is True and verdicts[3][0] > 0.2
    assert verdicts[1][1] is False
    assert verdicts[2][1] is False
    assert verdicts[4][1] is False
