"""Right-to-be-forgotten cascade (catalog.forget)."""

import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.catalog import Catalog, forget


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark)
    events = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(100)],
        "event_id long, user_id long, value double",
    )
    orders = spark.createDataFrame(
        [(i, i % 5) for i in range(50)], "order_id long, user_id long"
    )
    parts = spark.createDataFrame([(1, "widget")], "part_id long, name string")
    for name, df in (("events", events), ("orders", orders), ("parts", parts)):
        p = str(tmp_path / f"{name}.parquet")
        df.write.parquet(p)
        c.add_table(name, p)
    return c


def test_forget_cascades_only_matching_tables(spark, cat):
    ids = spark.createDataFrame([(1,), (3,)], "uid long")
    audit = forget(cat, "user_id", ids, dry_run=True)
    assert audit == {"events": 40, "orders": 20}  # parts has no user_id
    # dry run touched nothing
    assert cat.table("events").count() == 100

    removed = forget(cat, "user_id", ids)
    assert removed == audit
    ev = cat.table("events")
    assert ev.count() == 60
    assert ev.filter(F.col("user_id").isin(1, 3)).count() == 0
    assert cat.table("orders").count() == 30
    assert cat.table("parts").count() == 1

    # idempotent: a re-run removes nothing further
    assert forget(cat, "user_id", ids) == {"events": 0, "orders": 0}


def test_forget_rejects_multi_column_ids(spark, cat):
    with pytest.raises(ValueError, match="exactly one column"):
        forget(cat, "user_id", spark.createDataFrame([(1, 2)], "a long, b long"))


def test_forget_tombstones_vector_indexes(spark, cat, tmp_path):
    """Erasure propagates into persisted vector indexes: forgotten ids
    are tombstoned so searches exclude them immediately, and a vacuum
    reclaims them physically."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import (
        build_ivf_index,
        ivf_vacuum,
        load_ivf_index,
        save_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").alias("user_id"), F.col("embedding").alias("vector")
    )
    indexed, cents = build_ivf_index(emb, "vector", n_clusters=4, seed=1)
    idx = str(tmp_path / "emb_idx")
    save_ivf_index(indexed, cents, idx)

    ids = spark.createDataFrame([(1,), (3,)], "uid long")
    removed = forget(cat, "user_id", ids, index_paths=[idx])
    assert removed[f"index:{idx}"] == 2
    loaded, _ = load_ivf_index(spark, idx)
    assert loaded.filter(F.col("user_id").isin(1, 3)).count() == 0
    assert ivf_vacuum(spark, idx) == 2


def test_forget_tombstones_ivfpq_indexes(spark, cat, tmp_path):
    """IVF-PQ indexes share the corpus/ + tombstones layout, so an
    erasure against one must be honored by its loader too (round-4
    advice: load_ivfpq_index used to read corpus/ directly and silently
    returned forgotten vectors). Probe exclusion is immediate, appends
    after the erasure stay filtered, and ivfpq_vacuum reclaims."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivfpq import (
        build_ivfpq_index,
        ivfpq_append,
        ivfpq_vacuum,
        load_ivfpq_index,
        save_ivfpq_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").alias("user_id"), F.col("embedding").alias("vector")
    )
    encoded, cents, books = build_ivfpq_index(
        emb.filter(F.col("user_id") < 200), "vector", n_clusters=4, m=4, k=16, seed=1
    )
    idx = str(tmp_path / "emb_ivfpq")
    save_ivfpq_index(encoded, cents, books, idx)

    ids = spark.createDataFrame([(1,), (3,)], "uid long")
    removed = forget(cat, "user_id", ids, index_paths=[idx])
    assert removed[f"index:{idx}"] == 2
    loaded, _, _ = load_ivfpq_index(spark, idx)
    assert loaded.filter(F.col("user_id").isin(1, 3)).count() == 0
    # an append against the frozen quantizers must not resurrect them
    ivfpq_append(
        emb.filter((F.col("user_id") >= 200) & (F.col("user_id") < 210)), idx
    )
    loaded, _, _ = load_ivfpq_index(spark, idx)
    assert loaded.filter(F.col("user_id").isin(1, 3)).count() == 0
    assert loaded.filter(F.col("user_id") >= 200).count() == 10
    assert ivfpq_vacuum(spark, idx) == 2
    loaded, _, _ = load_ivfpq_index(spark, idx)
    assert loaded.filter(F.col("user_id").isin(1, 3)).count() == 0


def test_forget_crash_between_renames_recovers(spark, cat, tmp_path):
    """A crash in forget's swap window (old data moved aside, new data
    not yet published) must not strand the table: the next catalog read
    publishes the complete __forget_tmp; an INCOMPLETE tmp instead
    restores __forget_old so the erasure can re-run."""
    import os
    import shutil

    path = cat.paths["orders"]

    # --- crash AFTER the first rename, tmp complete (has _SUCCESS) ---
    survivors = cat.table("orders").filter(~F.col("user_id").isin(1, 3))
    want = survivors.count()
    survivors.write.mode("overwrite").parquet(path + ".__forget_tmp")
    os.rename(path, path + ".__forget_old")  # simulated crash point
    got = cat.table("orders")  # recover_forget publishes tmp
    assert got.count() == want
    assert got.filter(F.col("user_id").isin(1, 3)).count() == 0
    assert os.path.exists(path)
    assert not os.path.exists(path + ".__forget_old")
    assert not os.path.exists(path + ".__forget_tmp")

    # --- crash mid-WRITE: tmp incomplete (no _SUCCESS), old moved aside ---
    os.makedirs(path + ".__forget_tmp")  # half-written, no _SUCCESS
    os.rename(path, path + ".__forget_old")
    got = cat.table("orders")  # recover_forget restores old
    assert got.count() == want
    assert os.path.exists(path)
    assert not os.path.exists(path + ".__forget_tmp")


def test_recover_forget_waits_out_live_swap_window(tmp_path):
    """A reader that lands INSIDE a live swap window (swapper holds the
    lock, table momentarily absent from path) must block on the lock and
    then no-op — not publish tmp out from under the swapper (the round-5
    advice race: the swapper's own rename then raised FileNotFoundError
    and aborted the cascade mid-way)."""
    import os
    import threading
    import time

    from confluent_kafka_vector_search_prompt_inference_spark.catalog import _swap_lock, recover_forget

    path = str(tmp_path / "t.parquet")
    tmp = path + ".__forget_tmp"
    os.makedirs(tmp)
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    # table absent + complete tmp = exactly what a mid-swap window looks
    # like to an unlocked reader
    done = threading.Event()

    def reader():
        recover_forget(path)
        done.set()

    with _swap_lock(path):  # we are "the swapper", inside the window
        t = threading.Thread(target=reader)
        t.start()
        time.sleep(0.3)
        assert not done.is_set(), "reader entered the swap window"
        os.rename(tmp, path)  # swapper completes its own publish
    t.join(timeout=10)
    assert done.is_set()
    # reader re-checked under the lock, saw the table, touched nothing
    assert os.path.isdir(path)
    assert not os.path.exists(tmp)


def test_concurrent_recovers_one_wins(tmp_path):
    """Two readers recovering the same real crash: exactly one publishes;
    the loser re-checks under the lock and returns (previously the loser
    raised ENOTEMPTY renaming tmp onto the now-existing path)."""
    import os
    import threading

    from confluent_kafka_vector_search_prompt_inference_spark.catalog import recover_forget

    path = str(tmp_path / "t.parquet")
    tmp = path + ".__forget_tmp"
    os.makedirs(tmp)
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    errs = []

    def run():
        try:
            recover_forget(path)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=run) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert errs == []
    assert os.path.isdir(path)
    assert not os.path.exists(tmp)


def test_recover_forget_tolerates_readonly_parent(tmp_path):
    """Lock acquisition is best-effort: a read-only catalog directory
    (e.g. shared testdata) cannot host a lock file, and has nothing to
    recover — the call must not raise."""
    import os

    from confluent_kafka_vector_search_prompt_inference_spark.catalog import recover_forget

    d = tmp_path / "ro"
    d.mkdir()
    os.chmod(d, 0o555)
    try:
        recover_forget(str(d / "absent.parquet"))  # no lock file creatable
    finally:
        os.chmod(d, 0o755)
