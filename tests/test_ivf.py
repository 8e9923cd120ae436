"""IVF index: planted-neighbor recall, probe-width effect, exact agreement
when probing all clusters."""

import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import build_ivf_index, topk_ivf
from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import topk_similarity_join


@pytest.fixture(scope="module")
def ivf(embeddings):
    corpus = embeddings.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("vector"))
    indexed, centroids = build_ivf_index(corpus, "vector", n_clusters=8, seed=42)
    return corpus, indexed.cache(), centroids


def test_planted_neighbors_found(spark, embeddings, ivf):
    corpus, indexed, centroids = ivf
    q = embeddings.filter(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    out = topk_ivf(
        q, indexed, centroids, k=1,
        query_id="qid", corpus_id="cid", metric="cosine", n_probe=1,
    ).toPandas()
    # a query identical to a corpus vector lands in that vector's cluster
    hits = sum(1 for r in out.itertuples() if r.qid == r.cid)
    assert hits == 30


def test_full_probe_equals_exact(spark, embeddings, ivf):
    corpus, indexed, centroids = ivf
    q = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    exact = topk_similarity_join(
        q, corpus, k=5, query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector", strategy="broadcast_corpus",
    ).toPandas()
    approx = topk_ivf(
        q, indexed, centroids, k=5,
        query_id="qid", corpus_id="cid", n_probe=8,  # probe every cluster
    ).toPandas()
    e = {(r.qid, r.cid, r.rank) for r in exact.itertuples()}
    a = {(r.qid, r.cid, r.rank) for r in approx.itertuples()}
    assert e == a


def test_probe_width_monotonic_recall(spark, embeddings, ivf):
    corpus, indexed, centroids = ivf
    q = embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    exact = topk_similarity_join(
        q, corpus, k=3, query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector", strategy="broadcast_corpus",
    ).toPandas()
    e = set(zip(exact.qid, exact.cid))

    def recall(n_probe):
        a = topk_ivf(
            q, indexed, centroids, k=3,
            query_id="qid", corpus_id="cid", n_probe=n_probe,
        ).toPandas()
        return len(e & set(zip(a.qid, a.cid))) / len(e)

    r1, r4, r8 = recall(1), recall(4), recall(8)
    assert r1 <= r4 <= r8
    assert r8 == 1.0


def test_persisted_index_roundtrip_and_pruning(spark, embeddings, ivf, tmp_path):
    """Saving the index and searching the loaded copy gives identical
    results, and the probe statically prunes the cluster-partitioned
    corpus (compile-time PartitionFilters on the probed cluster set —
    reads only probed directories)."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import load_ivf_index, save_ivf_index
    from confluent_kafka_vector_search_prompt_inference_spark.plans import formatted_plan

    corpus, indexed, centroids = ivf
    path = str(tmp_path / "ivf_index")
    save_ivf_index(indexed, centroids, path)
    loaded_corpus, loaded_centroids = load_ivf_index(spark, path)
    assert (loaded_centroids == centroids).all()

    q = embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    mem = topk_ivf(
        q, indexed, centroids, k=3,
        query_id="qid", corpus_id="cid", metric="cosine", n_probe=2,
    ).toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    disk = topk_ivf(
        q, loaded_corpus, loaded_centroids, k=3,
        query_id="qid", corpus_id="cid", metric="cosine", n_probe=2,
    )
    plan = formatted_plan(disk)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*ivf_cluster[^\]]*)\]", plan)
    assert m and ("IN" in m.group(1) or "isin" in m.group(1).lower()), plan
    disk_pd = disk.toPandas().sort_values(["qid", "rank"]).reset_index(drop=True)
    assert mem[["qid", "cid", "rank"]].equals(disk_pd[["qid", "cid", "rank"]])


def test_ivf_append_without_retraining(spark, embeddings, ivf, tmp_path):
    """ivf_append assigns new vectors to existing clusters and appends into
    the partitioned layout: an appended copy of a corpus vector becomes
    findable by the unchanged search code, centroids stay frozen, and the
    append lands inside cluster partition directories."""
    import os

    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import (
        ivf_append,
        load_ivf_index,
        save_ivf_index,
        topk_ivf,
    )

    corpus, indexed, centroids = ivf
    path = str(tmp_path / "ivf_index")
    save_ivf_index(indexed, centroids, path)
    # append exact copies of vectors 0-9 under new ids 100000+
    new_rows = embeddings.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("cid"), F.col("embedding").alias("vector")
    )
    ivf_append(new_rows, path)
    loaded_corpus, loaded_centroids = load_ivf_index(spark, path)
    assert (loaded_centroids == centroids).all()  # frozen
    assert loaded_corpus.count() == indexed.count() + 10
    # appended files live inside cluster=<id> partition dirs (pruning holds)
    top = os.listdir(os.path.join(path, "corpus"))
    assert all(
        e.startswith("ivf_cluster=") or e.startswith("_") or e.startswith(".")
        for e in top
    )
    # a query identical to an appended vector finds it at rank 1 or 2
    # (ties with its original copy break by id: original wins rank 1)
    q = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    out = topk_ivf(
        q, loaded_corpus, loaded_centroids, k=2,
        query_id="qid", corpus_id="cid", metric="cosine", n_probe=1,
    ).toPandas()
    for qid, grp in out.groupby("qid"):
        ids = set(grp.cid)
        assert qid in ids and qid + 100000 in ids


def test_ivf_append_rejects_schema_mismatch(spark, embeddings, ivf, tmp_path):
    import pytest as _pytest

    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import ivf_append, save_ivf_index

    corpus, indexed, centroids = ivf
    path = str(tmp_path / "ivf_index")
    save_ivf_index(indexed, centroids, path)
    wrong = embeddings.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 200000).alias("other_id"),  # wrong id column name
        F.col("embedding").alias("vector"),
    )
    with _pytest.raises(ValueError, match="schema mismatch"):
        ivf_append(wrong, path)


def test_ivf_delete_tombstones_and_vacuum(spark, embeddings, ivf, tmp_path):
    """Deleted ids vanish from search immediately (tombstone anti-join at
    load), vacuum physically reclaims them while preserving the cluster
    partitioning, and results are identical before and after vacuum."""
    import os

    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import (
        ivf_delete,
        ivf_vacuum,
        load_ivf_index,
        save_ivf_index,
    )

    corpus, indexed, centroids = ivf
    path = str(tmp_path / "ivf_del")
    save_ivf_index(indexed, centroids, path)

    q = embeddings.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    # a query identical to corpus vector v finds v at rank 1 (n_probe=8 = all)
    loaded, cents = load_ivf_index(spark, path)
    before = topk_ivf(
        q, loaded, cents, k=1, query_id="qid", corpus_id="cid",
        metric="cosine", n_probe=8,
    )
    assert all(r.qid == r.cid for r in before.collect())

    dead = spark.createDataFrame([(i,) for i in range(10)], "cid long")
    ivf_delete(dead, path)
    loaded2, cents2 = load_ivf_index(spark, path)
    after = topk_ivf(
        q, loaded2, cents2, k=1, query_id="qid", corpus_id="cid",
        metric="cosine", n_probe=8,
    ).collect()
    assert all(r.cid >= 10 for r in after)  # self-hits gone
    tombstoned = {(r.qid, r.cid) for r in after}

    n = ivf_vacuum(spark, path)
    assert n == 10
    assert not os.path.isdir(os.path.join(path, "tombstones"))
    loaded3, cents3 = load_ivf_index(spark, path)
    assert loaded3.filter(F.col("cid") < 10).count() == 0
    # partition layout preserved
    assert any(
        d.startswith("ivf_cluster=")
        for d in os.listdir(os.path.join(path, "corpus"))
    )
    vacuumed = {
        (r.qid, r.cid)
        for r in topk_ivf(
            q, loaded3, cents3, k=1, query_id="qid", corpus_id="cid",
            metric="cosine", n_probe=8,
        ).collect()
    }
    assert vacuumed == tombstoned


def test_ivf_vacuum_crash_recovery(spark, embeddings, ivf, tmp_path):
    """A vacuum that crashed after publishing corpus_tmp (with _SUCCESS)
    but before the rename is finished by the next load; an incomplete
    corpus_tmp is discarded."""
    import os
    import shutil

    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import (
        ivf_delete,
        load_ivf_index,
        save_ivf_index,
    )

    corpus, indexed, centroids = ivf
    path = str(tmp_path / "ivf_crash")
    save_ivf_index(indexed, centroids, path)
    ivf_delete(
        spark.createDataFrame([(0,), (1,)], "cid long"), path
    )
    # simulate the crash window: complete tmp written, old corpus deleted,
    # rename + tombstone-clear never happened
    loaded, _ = load_ivf_index(spark, path)
    tmp = os.path.join(path, "corpus_tmp")
    loaded.write.partitionBy("ivf_cluster").mode("overwrite").parquet(tmp)
    shutil.rmtree(os.path.join(path, "corpus"))
    recovered, _ = load_ivf_index(spark, path)
    assert os.path.isdir(os.path.join(path, "corpus"))
    assert not os.path.isdir(tmp)
    assert not os.path.isdir(os.path.join(path, "tombstones"))
    assert recovered.filter(F.col("cid") < 2).count() == 0

    # incomplete tmp (no _SUCCESS) is garbage-collected, corpus untouched
    os.makedirs(os.path.join(tmp, "ivf_cluster=0"))
    n_before = recovered.count()
    again, _ = load_ivf_index(spark, path)
    assert not os.path.isdir(tmp)
    assert again.count() == n_before


def test_ivf_delete_rejects_bad_ids(spark, embeddings, ivf, tmp_path):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import ivf_delete, save_ivf_index

    corpus, indexed, centroids = ivf
    path = str(tmp_path / "ivf_guard")
    save_ivf_index(indexed, centroids, path)
    with pytest.raises(ValueError, match="exactly one column"):
        ivf_delete(spark.createDataFrame([(1, 2)], "a long, b long"), path)
    with pytest.raises(ValueError, match="not in index corpus"):
        ivf_delete(spark.createDataFrame([(1,)], "nope long"), path)
    ivf_delete(spark.createDataFrame([(1,)], "cid long"), path)
    with pytest.raises(ValueError, match="type mismatch"):
        ivf_delete(spark.createDataFrame([(2,)], "cid int"), path)


def test_ivf_compact_and_stats_streaming_layout(spark, embeddings, ivf, tmp_path):
    """ivf_compact folds the streaming _batch layout into the flat
    cluster layout with identical content; ivf_index_stats reports
    per-cluster counts that sum to the corpus."""
    import os

    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import (
        ivf_compact,
        ivf_delete,
        ivf_index_stats,
        load_ivf_index,
        save_ivf_index,
    )

    corpus, indexed, centroids = ivf
    path = str(tmp_path / "ivf_c")
    save_ivf_index(indexed, centroids, path)
    # fabricate a streaming-ish layout: move the flat corpus under _batch=0
    # and write a second committed batch
    cdir = os.path.join(path, "corpus")
    import shutil

    tmp0 = os.path.join(path, "b0")
    os.rename(cdir, tmp0)
    os.makedirs(cdir)
    os.rename(tmp0, os.path.join(cdir, "_batch=0"))
    open(os.path.join(cdir, "_batch=0", "_SUCCESS"), "w").close()
    extra = indexed.filter(F.col("cid") < 5).withColumn(
        "cid", F.col("cid") + 500000
    )
    extra.write.partitionBy("ivf_cluster").parquet(os.path.join(cdir, "_batch=1"))

    n_before = load_ivf_index(spark, path)[0].count()
    assert n_before == indexed.count() + 5

    ivf_delete(spark.createDataFrame([(500000,)], "cid long"), path)
    ivf_compact(spark, path)
    assert not any(d.startswith("_batch=") for d in os.listdir(cdir))
    assert any(d.startswith("ivf_cluster=") for d in os.listdir(cdir))
    loaded, _ = load_ivf_index(spark, path)
    assert loaded.count() == n_before - 1  # tombstone applied in the fold
    assert loaded.filter(F.col("cid") == 500000).count() == 0

    stats = ivf_index_stats(spark, path)
    rows = stats.collect()
    assert sum(r.n_rows for r in rows) == n_before - 1
    assert all(abs(r.share - r.n_rows / (n_before - 1)) < 1e-5 for r in rows)


# ---------------------------------------------------------------------------
# drift-triggered maintenance: split oversized clusters (round 6)
# ---------------------------------------------------------------------------

from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import (  # noqa: E402
    ivf_append,
    ivf_delete,
    ivf_index_stats,
    ivf_split_oversized,
    load_ivf_index,
    recover_split,
    save_ivf_index,
)


def _drifted(embeddings, lo, hi, shift):
    """Corpus rows shifted by a constant — mass far from every trained
    centroid, so frozen-centroid appends pile into ONE nearest cluster."""
    return embeddings.filter(
        (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
    ).select(
        (F.col("vec_id") + 100_000).alias("cid"),
        F.transform("embedding", lambda x: x + shift)
        .cast("array<float>")
        .alias("vector"),
    )


def _probe_recall(spark, path, queries, k=5, n_probe=2):
    """recall@k of the persisted index's probe vs exact brute force."""
    corpus, cents = load_ivf_index(spark, path)
    approx = topk_ivf(
        queries, corpus, cents, k=k,
        query_id="qid", corpus_id="cid", n_probe=n_probe,
    ).select("qid", "cid")
    exact = topk_similarity_join(
        queries, corpus.select("cid", "vector"), k,
        query_id="qid", corpus_id="cid", strategy="broadcast_queries",
    ).select("qid", "cid")
    hits = exact.join(approx, ["qid", "cid"]).count()
    return hits / exact.count()


def test_split_oversized_heals_drift_skew(spark, embeddings, ivf, tmp_path):
    """The round-6 maintenance contract: a drifted append stream piles
    into one cluster; ivf_split_oversized splits it locally (no full
    rebuild) — skew drops, cluster count grows, probe recall on the
    drifted queries comes back to within epsilon of a FRESH rebuild at
    the same cluster count, and the lifecycle (append/delete) still
    works on the split index."""
    corpus, indexed, centroids = ivf
    path = str(tmp_path / "drift_idx")
    save_ivf_index(indexed, centroids, path)

    # drifted appends: 300 far-shifted rows → nearest-centroid assignment
    # concentrates them
    ivf_append(_drifted(embeddings, 0, 300, 8.0), path)
    stats_before = ivf_index_stats(spark, path).toPandas()
    assert stats_before.skew_vs_balanced.max() >= 2.0, "drift failed to skew"

    dq = _drifted(embeddings, 0, 40, 8.0).select(
        (F.col("cid") - 100_000).alias("qid"), "vector"
    )
    split = ivf_split_oversized(spark, path, max_skew=2.0, seed=7)
    assert split, "no cluster was split despite skew >= 2"

    stats_after = ivf_index_stats(spark, path).toPandas()
    assert len(stats_after) > len(stats_before)  # new sub-clusters exist
    assert stats_after.skew_vs_balanced.max() < stats_before.skew_vs_balanced.max()
    # no rows lost or duplicated by the swap
    assert stats_after.n_rows.sum() == stats_before.n_rows.sum()

    # recall vs a fresh rebuild at the same cluster count
    r_split = _probe_recall(spark, path, dq)
    fresh_path = str(tmp_path / "fresh_idx")
    all_rows = load_ivf_index(spark, path)[0].select("cid", "vector")
    fr_indexed, fr_cents = build_ivf_index(
        all_rows, "vector", n_clusters=len(stats_after), seed=7
    )
    save_ivf_index(fr_indexed, fr_cents, fresh_path)
    r_fresh = _probe_recall(spark, fresh_path, dq)
    assert r_split >= r_fresh - 0.15, (
        f"split-index recall {r_split} fell past fresh-rebuild {r_fresh}"
    )

    # lifecycle intact: append + tombstone delete still work
    ivf_append(_drifted(embeddings, 300, 310, 8.0), path)
    ivf_delete(
        spark.createDataFrame([(100_000,)], "cid long"), path
    )
    reloaded, _ = load_ivf_index(spark, path)
    assert reloaded.filter(F.col("cid") == 100_000).count() == 0
    assert reloaded.filter(F.col("cid") >= 100_300).count() == 10


def test_split_drops_tombstones_in_rewritten_cluster(spark, embeddings, ivf, tmp_path):
    """The split stage reads through apply_tombstones, so tombstoned rows
    of the rewritten cluster are physically dropped for free."""
    corpus, indexed, centroids = ivf
    path = str(tmp_path / "tomb_idx")
    save_ivf_index(indexed, centroids, path)
    ivf_append(_drifted(embeddings, 0, 300, 8.0), path)
    dead = spark.createDataFrame([(100_000 + i,) for i in range(50)], "cid long")
    ivf_delete(dead, path)
    n_before = load_ivf_index(spark, path)[0].count()
    split = ivf_split_oversized(spark, path, max_skew=2.0, seed=7)
    assert split
    after, _ = load_ivf_index(spark, path)
    assert after.count() == n_before  # tombstoned rows stay gone
    assert after.filter(F.col("cid") < 100_050).filter(F.col("cid") >= 100_000).count() == 0


def test_recover_split_rolls_back_unstamped_stage(spark, embeddings, ivf, tmp_path):
    """A stage without _COMMIT means the split died before publishing —
    recovery must delete it and leave the index untouched."""
    import os

    corpus, indexed, centroids = ivf
    path = str(tmp_path / "rb_idx")
    save_ivf_index(indexed, centroids, path)
    n = load_ivf_index(spark, path)[0].count()
    st = os.path.join(path, "split_tmp")
    os.makedirs(os.path.join(st, "newc"))
    reloaded, cents = load_ivf_index(spark, path)  # triggers recovery
    assert not os.path.exists(st)
    assert reloaded.count() == n
    assert len(cents) == len(centroids)


def test_recover_split_replays_partial_commit(spark, embeddings, ivf, tmp_path):
    """Crash mid-commit (old cluster dir retired, halves not yet
    published): the next load rolls the staged split FORWARD — same
    row count, one more cluster, stage gone."""
    import json
    import os

    corpus, indexed, centroids = ivf
    path = str(tmp_path / "fw_idx")
    save_ivf_index(indexed, centroids, path)
    ivf_append(_drifted(embeddings, 0, 300, 8.0), path)
    n = load_ivf_index(spark, path)[0].count()

    # run a real split (may cascade into several) to produce a published
    # state, then rewind ONE split's commit to its first step and let
    # recovery replay the rest
    split = ivf_split_oversized(spark, path, max_skew=2.0, seed=7)
    assert split
    n_cents_post = len(load_ivf_index(spark, path)[1])
    c = split[0]
    corpus_dir = os.path.join(path, "corpus")
    st = os.path.join(path, "split_tmp")
    b = len(centroids)  # the id the first split allocated
    # reconstruct "crashed after step 1": stash the published halves back
    # into a stage and retire the live c dir
    os.makedirs(st)
    os.rename(os.path.join(corpus_dir, f"ivf_cluster={c}"), os.path.join(st, "newc"))
    os.rename(os.path.join(corpus_dir, f"ivf_cluster={b}"), os.path.join(st, "newb"))
    with open(os.path.join(st, "plan.json"), "w") as fh:
        json.dump({"cluster": int(c), "new_cluster": int(b)}, fh)
    with open(os.path.join(st, "_COMMIT"), "w"):
        pass

    reloaded, cents = load_ivf_index(spark, path)  # recovery completes it
    assert not os.path.exists(st)
    assert reloaded.count() == n
    assert len(cents) == n_cents_post


def test_recover_split_honors_recorded_cluster_col(tmp_path):
    """plan.json records the split's cluster_col; recovery after a crash
    heals the RIGHT ``<col>=<id>`` directories even when the recovering
    loader calls with the default column name."""
    import json
    import os

    path = str(tmp_path / "cc_idx")
    corpus = os.path.join(path, "corpus")
    os.makedirs(os.path.join(corpus, "pc=0"))
    with open(os.path.join(corpus, "pc=0", "part-old.parquet"), "w") as fh:
        fh.write("old")
    st = os.path.join(path, "split_tmp")
    os.makedirs(os.path.join(st, "newc"))
    with open(os.path.join(st, "newc", "part-new.parquet"), "w") as fh:
        fh.write("new-half-c")
    os.makedirs(os.path.join(st, "newb"))
    with open(os.path.join(st, "newb", "part-new.parquet"), "w") as fh:
        fh.write("new-half-b")
    with open(os.path.join(st, "plan.json"), "w") as fh:
        json.dump({"cluster": 0, "new_cluster": 1, "cluster_col": "pc"}, fh)
    with open(os.path.join(st, "_COMMIT"), "w"):
        pass

    recover_split(path)  # default cluster_col — the recorded 'pc' must win

    assert not os.path.exists(st)
    assert os.path.isdir(os.path.join(corpus, "pc=1"))
    assert os.path.exists(os.path.join(corpus, "pc=0", "part-new.parquet"))
    assert not os.path.exists(os.path.join(corpus, "pc=0", "part-old.parquet"))
    # and no directory was created under the (wrong) default column name
    assert not os.path.isdir(os.path.join(corpus, "ivf_cluster=0"))


def test_split_oversized_ambiguous_vector_column(spark, embeddings, ivf, tmp_path):
    """A corpus carrying a second array column is ambiguous — the splitter
    must demand an explicit vec_col rather than guess (and accept one)."""
    import pytest

    corpus, indexed, centroids = ivf
    path = str(tmp_path / "ambig_idx")
    save_ivf_index(
        indexed.withColumn("payload", F.array(F.lit(1.0), F.lit(2.0))),
        centroids,
        path,
    )
    with pytest.raises(ValueError, match="vec_col"):
        ivf_split_oversized(spark, path, max_skew=2.0, seed=7)
    # naming the column resolves it (balanced index → nothing to split)
    assert ivf_split_oversized(spark, path, max_skew=50.0, seed=7, vec_col="vector") == []


# ---------------------------------------------------------------------------
# recall_target on the persisted-index tier (round 7)
# ---------------------------------------------------------------------------


def test_calibrated_n_probe_meets_target(spark, embeddings, ivf):
    """recall_target= on the IVF tier: the calibrated probe width's
    measured sample recall meets the floor, and the end-to-end
    topk_ivf(recall_target=) result actually delivers it (the 20-query
    set sits inside the 32-query sample, so sample recall == full-set
    recall)."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import calibrate_ivf_n_probe

    corpus, indexed, centroids = ivf
    q = embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    n_probe, measured = calibrate_ivf_n_probe(
        q, indexed, centroids, 5, recall_target=0.9,
        query_id="qid", corpus_id="cid",
    )
    assert measured >= 0.9
    assert 1 <= n_probe <= len(centroids)

    exact = topk_similarity_join(
        q, corpus, k=5, query_id="qid", query_vec="vector",
        corpus_id="cid", corpus_vec="vector", strategy="broadcast_queries",
    ).toPandas()
    approx = topk_ivf(
        q, indexed, centroids, k=5,
        query_id="qid", corpus_id="cid", recall_target=0.9,
    ).toPandas()
    e = set(zip(exact.qid, exact.cid))
    assert len(e & set(zip(approx.qid, approx.cid))) / len(e) >= 0.9


def test_calibrated_n_probe_monotone_in_target(spark, embeddings, ivf):
    """A tighter recall floor can only widen the probe; target 1.0 is
    always reachable on this tier (the deepest rung probes every cluster
    — the exact scan), unlike the capped binary/LSH ladders."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import calibrate_ivf_n_probe

    corpus, indexed, centroids = ivf
    q = embeddings.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    common = dict(query_id="qid", corpus_id="cid")
    p_loose, r_loose = calibrate_ivf_n_probe(
        q, indexed, centroids, 5, recall_target=0.5, **common
    )
    p_tight, r_tight = calibrate_ivf_n_probe(
        q, indexed, centroids, 5, recall_target=1.0, **common
    )
    assert p_loose <= p_tight <= len(centroids)
    assert r_tight == 1.0


def test_calibrate_ivf_rejects_bad_target(spark, embeddings, ivf):
    from confluent_kafka_vector_search_prompt_inference_spark.operators.ivf import calibrate_ivf_n_probe

    corpus, indexed, centroids = ivf
    q = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    with pytest.raises(ValueError, match="recall_target"):
        calibrate_ivf_n_probe(
            q, indexed, centroids, 5, recall_target=1.5,
            query_id="qid", corpus_id="cid",
        )


def test_query_matrix_over_budget_raises(spark, embeddings, ivf, monkeypatch):
    """The probe tier's queries ≪ corpus premise is a priced contract, not
    a hope: a query matrix over the broadcast budget raises a descriptive
    error instead of silently OOMing the driver at scale."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators import topk_join

    corpus, indexed, centroids = ivf
    q = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("vector")
    )
    monkeypatch.setattr(topk_join, "_BROADCAST_BUDGET_BYTES", 64)
    with pytest.raises(ValueError, match="broadcast budget"):
        topk_ivf(
            q, indexed, centroids, k=3, query_id="qid", corpus_id="cid",
        ).collect()
