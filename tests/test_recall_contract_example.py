"""examples/recall_contract.py stays runnable and honest: every tier's
calibrated knob meets the recall floor it declared."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
)

TARGETS = {"binary": 0.9, "lsh": 0.8, "ivf": 0.95, "ivfpq": 0.85}


def test_recall_contract_example_meets_declared_floors(spark):
    from recall_contract import run

    out = run(spark)
    assert set(out) == set(TARGETS)
    for tier, (knob, recall) in out.items():
        assert recall >= TARGETS[tier], (tier, knob, recall)
