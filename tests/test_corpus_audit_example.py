"""examples/corpus_audit.py stays runnable and honest: the bloom gate
never misses a seen URL, the KMV overlap estimates track the planted
ground truth, and the source matrix covers every pair."""

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
    ),
)


def test_corpus_audit_example(spark):
    from corpus_audit import run

    out = run(spark)
    assert out["day1_landed"] == 600
    # the bloom never misses: every truly-seen URL is in the maybe set
    assert out["no_false_negatives"]
    assert out["day2_truly_seen"] == 300
    # definitely-new + maybe-seen partition the 600 probes
    assert out["day2_definitely_new"] + out["day2_maybe_seen"] == 600
    # fp rate at m/n ~ 27: the maybe sliver stays close to the truth
    assert out["day2_maybe_seen"] <= 330
    # KMV overlap tracks the planted 1/3 jaccard within 4 sigma of k=128
    est = out["overlap_est"]
    assert abs(est["jaccard"] - 1 / 3) <= 4 * (0.25 / 128) ** 0.5 + 0.01
    assert abs(est["intersection"] / 300 - 1) <= 0.35
    # sources are disjoint by construction (url embeds its source): the
    # matrix has all 3 pairs, each with zero estimated overlap
    assert len(out["matrix"]) == 3
    assert all(j == 0.0 for _, _, j in out["matrix"])
    # grouped bloom (round 12): every same-source re-crawl is a member
    # of its OWN source's bloom (superset — no false negatives per
    # group), while a different source's bloom reads (near) empty for
    # the same URLs
    assert out["day2_seen_by_own_source"] >= 300
    assert out["day2_seen_by_own_source"] <= 330
    assert out["cross_source_hits"] <= 20
