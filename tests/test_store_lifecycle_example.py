"""examples/store_lifecycle.py stays runnable and honest: the store
survives compact → rebucket → retire → prune and still dedups live
history while forgetting retired history."""

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
def test_store_lifecycle_example(spark):
    from store_lifecycle import run

    out = run(spark)
    assert out["landed_after_stream"] == [1, 2, 3]  # near-copy 10 dropped
    assert out["shape_after_compact"]["partitioned_runs"] >= 1
    assert out["partitions_after_rebucket"] == 16
    assert out["retired_epochs"]  # something was actually retired
    # near-copy of LIVE doc 2 dropped; near-copy of RETIRED doc 1 landed
    final = set(out["landed_final"])
    assert 21 in final and 20 not in final, out["landed_final"]


@pytest.mark.slow
def test_store_lifecycle_online_example(spark):
    """Round 9: the zero-downtime lifecycle — tombstoned retention and a
    rebucket REQUEST both drain through the stream's own maintenance;
    the migration finalizes, the tombstone GCs, dead rows leave the
    store, and dedup semantics hold throughout."""
    from store_lifecycle import run_online

    out = run_online(spark)
    assert out["retired_epochs"] == [0]
    assert out["tombstones_live"] == 1
    assert out["pending"] == {"target_partitions": 16}
    assert out["pending_after"] == {}          # migration finalized
    assert out["partitions_after"] == 16
    assert out["tombstones_after"] == 0        # drained and GC'd
    assert 1 not in out["store_ids"], out["store_ids"]  # dead rows gone
    final = set(out["landed_final"])
    assert 21 in final and 20 not in final, out["landed_final"]
