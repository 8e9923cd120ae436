"""IVF (inverted-file) approximate nearest neighbor — the clustered scale
path for similarity search (SURVEY.md §2.11; complements SRP-LSH in
``ann.py``).

Build: k-means the corpus into ``n_clusters`` partitions (Spark ML KMeans,
one pass over the data); store each corpus row's cluster id. At 100 TB the
cluster id becomes the table's physical partition key, so a probe touches
only ``n_probe / n_clusters`` of the data — the same pruning Atlas'
``numCandidates`` index scan performs (reference ``README.md:364-368``).

Query: assign each query to its ``n_probe`` nearest centroids DRIVER-SIDE
(queries ≪ corpus is the operator's premise; the centroid matrix is index
metadata), turn the probed cluster set into a static partition-pruning
filter, and BLAS-score each pruned cluster's rows against just the queries
probing it inside ``mapInPandas`` — per-query top-k kept within each Arrow
batch, so the only shuffle in the plan is the k-bounded window finalize.
No all-pairs work, no corpus shuffle, no per-candidate interpreted
expression in the hot path.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

from confluent_kafka_vector_search_prompt_inference_spark.functions.vector import vec_cosine, vec_dot


def build_ivf_index(
    corpus: DataFrame,
    vec_col: str = "vector",
    *,
    n_clusters: int = 16,
    seed: int = 42,
    max_iter: int = 10,
    sample_rows: int = 16_384,
    cluster_col: str = "ivf_cluster",
) -> tuple[DataFrame, np.ndarray]:
    """Cluster the corpus; returns (corpus + cluster id column, centroids).

    Train/add split (the FAISS recipe, and the same one
    ``train_pq_codebooks`` uses): centroids train DRIVER-SIDE on an
    order-invariant hash sample (bottom-``sample_rows`` by
    ``xxhash64(vector)`` — per-partition top-n heaps, one scan, identical
    sample for any physical row order), then the full corpus is assigned
    in ONE Arrow-batched map pass. Coarse centroids need thousands of
    representative rows, not the corpus; the previous distributed KMeans
    paid a full corpus pass per Lloyd iteration (10 scheduled jobs) to
    learn what the sample teaches in milliseconds — at 100 TB training is
    constant-cost and indexing is the single assignment scan.

    Centroids come back as a small ``(n_clusters, dim)`` float64 matrix —
    index *metadata*, shipped to queries via broadcast."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators._kmeans import kmeans_fit

    X = _hash_bottom_sample(corpus, vec_col, sample_rows)
    centroids = kmeans_fit(X, n_clusters, seed=seed, max_iter=max_iter)
    assign = _nearest_clusters_udf(centroids, n_probe=1)
    indexed = corpus.withColumn(
        cluster_col, F.element_at(assign(F.col(vec_col)), 1)
    )
    return indexed, centroids


def _hash_bottom_sample(df: DataFrame, vec_col: str, sample_rows: int) -> np.ndarray:
    """Order-invariant training sample: bottom-``sample_rows`` vectors by
    ``xxhash64(vector)`` as a float64 matrix.

    The naive ``orderBy(hash).limit(n).collect()`` plans a TakeOrdered
    whose driver MERGE receives each partition's local bottom-n — P·n
    rows. That is fine at file-sized partition counts, but a corpus
    arriving through a wide upstream (the 10M streaming-ladder rung
    embeds through 2,500 tasks) shipped 2,500 × n rows and blew
    ``spark.driver.maxResultSize``. When the input is wider than 64
    partitions, the narrow ``(vector)`` projection is repartitioned to
    64 FIRST — a shuffle of only the sample-input column, with the
    upstream (e.g. an embedding UDF) keeping its full parallelism on the
    map side — bounding the driver merge at 64·n rows regardless of
    corpus layout. The sample itself is unchanged: bottom-n by hash is
    bottom-n under any physical partitioning."""
    proj = df.select(vec_col)
    if proj.rdd.getNumPartitions() > 64:
        proj = proj.repartition(64)
    rows = (
        proj.orderBy(F.xxhash64(F.col(vec_col))).limit(sample_rows).collect()
    )
    return np.asarray([np.asarray(r[0], dtype=np.float64) for r in rows])


def _nearest_clusters_udf(centroids: np.ndarray, n_probe: int):
    """Arrow-batched assignment of each query vector to its n_probe nearest
    centroids (euclidean, matching KMeans training). The returned ids are
    ORDERED by ascending distance (ties by cluster id), so the probe list
    at depth p is a strict prefix of the list at depth P > p — the
    prefix-monotone pool :func:`calibrate_ivf_n_probe` prices the whole
    probe ladder from. Ordering the selected ``n_probe`` ids is O(p log p)
    per row on top of the O(n_clusters) argpartition — negligible."""
    cent = centroids.astype(np.float64)
    cent_sq = (cent**2).sum(axis=1)

    @F.pandas_udf(ArrayType(IntegerType()))
    def assign(vs: pd.Series) -> pd.Series:
        Q = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        d2 = (Q**2).sum(axis=1)[:, None] - 2.0 * (Q @ cent.T) + cent_sq[None, :]
        k = min(n_probe, cent.shape[0])
        idx = np.argpartition(d2, k - 1, axis=1)[:, :k]
        out = []
        for r in range(idx.shape[0]):
            sel = idx[r]
            order = np.lexsort((sel, d2[r, sel]))
            out.append([int(c) for c in sel[order]])
        return pd.Series(out)

    return assign


def save_ivf_index(
    indexed_corpus: DataFrame,
    centroids: np.ndarray,
    path: str,
    *,
    cluster_col: str = "ivf_cluster",
) -> None:
    """Persist the index: corpus parquet PARTITIONED BY cluster id, plus a
    tiny centroid table. Training happens once; every later search loads
    metadata only. Because the cluster id is the physical partition key,
    the probe join (tiny probed side → broadcast) triggers dynamic
    partition pruning — a probe of ``n_probe`` clusters reads exactly
    those directories off storage, which is what makes IVF an *index*
    rather than a full-scan rescorer at 100 TB.

    The corpus is repartitioned BY THE CLUSTER COLUMN before the
    partitioned write: without it every write task spills a file into
    every cluster directory it touches — at √n-sized cluster counts
    (1,000 clusters × 32 tasks = up to 32,000 tiny files) the listing/
    open amplification dominated every subsequent load (measured 3-20 s
    per probe at a 1M-row index). One shuffle at build time buys one
    file per cluster forever after."""
    from pyspark.sql import functions as _F

    spark = indexed_corpus.sparkSession
    indexed_corpus.repartition(_F.col(cluster_col)).write.partitionBy(
        cluster_col
    ).mode("overwrite").parquet(os.path.join(path, "corpus"))
    # pandas + explicit schema → Arrow path: a list-of-rows createDataFrame
    # pickles through 32 Python RDD partitions and pays ~4s of worker
    # round-trips for an 8-row metadata table.
    cent_pdf = pd.DataFrame(
        {
            "cluster_id": [int(i) for i in range(len(centroids))],
            "centroid": [[float(x) for x in c] for c in centroids],
        }
    )
    spark.createDataFrame(
        cent_pdf, schema="cluster_id int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))


def ivf_append(
    new_rows: DataFrame,
    path: str,
    *,
    vec_col: str = "vector",
    cluster_col: str = "ivf_cluster",
) -> None:
    """Incrementally add vectors to a saved IVF index WITHOUT retraining.

    The reference's corpus is continuously inserted into and its external
    index auto-updates (``README.md:370-382`` — Atlas indexes the
    collection as products land); this is that lifecycle for the IVF
    index: new vectors are assigned to their nearest existing centroid
    (the same Arrow-batched assignment the probe side uses, n_probe=1)
    and appended into the cluster's partition directory. Search code is
    unchanged — the next ``load_ivf_index`` sees the union, and partition
    pruning still holds because appends land inside ``cluster=<id>``
    directories.

    Centroids are frozen, so recall can drift as the data distribution
    moves (new mass far from every centroid concentrates in its nearest
    cluster); monitor per-cluster row-count skew and rebuild with
    :func:`build_ivf_index` when it degrades — the standard IVF
    maintenance trade, identical to FAISS's add-vs-train split."""
    spark = new_rows.sparkSession
    rows = (
        spark.read.parquet(os.path.join(path, "centroids"))
        .orderBy("cluster_id")
        .collect()
    )
    centroids = np.asarray([np.asarray(r.centroid, dtype=np.float64) for r in rows])
    assign = _nearest_clusters_udf(centroids, n_probe=1)
    assigned = new_rows.withColumn(
        cluster_col, F.element_at(assign(F.col(vec_col)), 1)
    )
    # analysis-time schema check: mode('append') would happily land
    # differently-shaped files, and the plain read that follows would pick
    # ONE footer's schema — appended ids silently nulling out at search
    # time. Fail here instead.
    existing = spark.read.parquet(os.path.join(path, "corpus")).schema
    got = {f.name: f.dataType for f in assigned.schema.fields}
    want = {f.name: f.dataType for f in existing.fields}
    if got != want:
        raise ValueError(
            f"ivf_append schema mismatch: index corpus has "
            f"{sorted((n, t.simpleString()) for n, t in want.items())}, "
            f"append would write "
            f"{sorted((n, t.simpleString()) for n, t in got.items())}"
        )
    assigned.select(*[f.name for f in existing.fields]).repartition(
        F.col(cluster_col)
    ).write.partitionBy(cluster_col).mode("append").parquet(
        os.path.join(path, "corpus")
    )


def ivf_delete(ids: DataFrame, path: str) -> None:
    """Delete vectors from a saved IVF index by id — tombstones, not
    rewrites (the LSM/Iceberg delete shape: at 100 TB a delete batch must
    not rewrite cluster directories; see ``operators/_index_io.py``).

    ``ids`` is a one-column DataFrame whose column NAME identifies the
    corpus id column; every subsequent :func:`load_ivf_index` anti-joins
    the tombstones out (broadcast — id-only, deletes-sized). Physical
    reclamation is :func:`ivf_vacuum`'s job; until then search
    correctness is already delete-aware. Completes the always-indexed
    lifecycle the reference's external index maintains on its
    continuously-mutated collection (``README.md:370-382``) alongside
    :func:`ivf_append`."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators._index_io import write_tombstones

    write_tombstones(ids, path)


def ivf_vacuum(spark: SparkSession, path: str, *, cluster_col: str = "ivf_cluster") -> int:
    """Physically rewrite the corpus minus tombstones (preserving the
    cluster partitioning) and clear the tombstone set. Returns the number
    of tombstoned ids reclaimed. Crash-safe — see
    ``operators/_index_io.vacuum``."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators._index_io import vacuum

    return vacuum(
        spark,
        path,
        lambda: load_ivf_index(spark, path)[0],  # already tombstone-filtered
        lambda df, tmp: df.repartition(F.col(cluster_col))
        .write.partitionBy(cluster_col)
        .mode("overwrite")
        .parquet(tmp),
    )


def ivf_compact(spark: SparkSession, path: str, *, cluster_col: str = "ivf_cluster") -> None:
    """Fold a streaming-layout corpus (``_batch=N/cluster=M`` dirs from
    ``streaming.pipeline.ivf_insert``) — or a heavily-appended flat one —
    into a single flat cluster-partitioned layout, applying any pending
    tombstones along the way. Bounded file counts are what keep scan
    planning cheap after months of micro-batch appends; same
    crash-safety as vacuum (publish-then-clear via ``corpus_tmp``)."""
    import shutil

    from confluent_kafka_vector_search_prompt_inference_spark.operators._index_io import recover_vacuum

    recover_vacuum(path)
    corpus, _ = load_ivf_index(spark, path)  # batched-layout + tombstone aware
    tmp = os.path.join(path, "corpus_tmp")
    corpus.repartition(F.col(cluster_col)).write.partitionBy(cluster_col).mode(
        "overwrite"
    ).parquet(tmp)
    shutil.rmtree(os.path.join(path, "corpus"))
    os.rename(tmp, os.path.join(path, "corpus"))
    tomb = os.path.join(path, "tombstones")
    if os.path.isdir(tomb):
        shutil.rmtree(tomb)


def ivf_index_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-cluster health of a saved index: row count, share of the
    corpus, and the skew ratio vs a balanced split — the monitoring
    signal the frozen-centroid append/insert lifecycle needs (rebuild
    with :func:`build_ivf_index` when drifted mass piles into few
    clusters; see ``ivf_append``'s docstring). Metadata-cheap: one
    count per cluster over the partition-pruned layout."""
    corpus, centroids = load_ivf_index(spark, path)
    n_clusters = len(centroids)
    counts = corpus.groupBy("ivf_cluster").agg(F.count("*").alias("n_rows"))
    total = counts.agg(F.sum("n_rows")).first()[0] or 1
    return counts.select(
        "ivf_cluster",
        "n_rows",
        F.round(F.col("n_rows") / F.lit(float(total)), 6).alias("share"),
        F.round(
            F.col("n_rows") / F.lit(float(total) / n_clusters), 3
        ).alias("skew_vs_balanced"),
    )


def recover_split(path: str, *, cluster_col: str = "ivf_cluster") -> None:
    """Finish or abandon a cluster split that crashed mid-commit.

    :func:`ivf_split_oversized` stages EVERYTHING under ``split_tmp/``
    (both halves' parquet dirs, the updated centroid table, a
    ``plan.json`` naming the cluster ids) and stamps ``_COMMIT`` only
    when staging is complete; the commit is then a fixed sequence of
    renames, each guarded by source-existence checks so it replays
    idempotently from any crash point. No ``_COMMIT`` → nothing was
    published — roll back by deleting the stage. Called on every index
    load, mirroring ``recover_vacuum``/``catalog.recover_forget``.

    The directory names to heal come from ``plan.json``'s recorded
    ``cluster_col`` (the splitter writes it): a crashed split of an
    index built with a custom cluster column is replayed against the
    RIGHT ``<col>=<id>`` directories even when the recovering loader
    didn't know the column. The parameter is the fallback for plans
    written before the column was recorded."""
    import json
    import shutil

    st = os.path.join(path, "split_tmp")
    if not os.path.isdir(st):
        return
    if not os.path.exists(os.path.join(st, "_COMMIT")):
        shutil.rmtree(st)  # staging died before commit — old state intact
        return
    with open(os.path.join(st, "plan.json")) as fh:
        plan = json.load(fh)
    c, b = plan["cluster"], plan["new_cluster"]
    cluster_col = plan.get("cluster_col", cluster_col)
    corpus = os.path.join(path, "corpus")
    c_dir = os.path.join(corpus, f"{cluster_col}={c}")
    # 1. retire the old oversized-cluster dir (skip if already moved)
    if os.path.isdir(c_dir) and not os.path.isdir(os.path.join(st, "oldc")):
        os.rename(c_dir, os.path.join(st, "oldc"))
    # 2./3. publish the two halves
    if os.path.isdir(os.path.join(st, "newc")):
        os.rename(os.path.join(st, "newc"), c_dir)
    if os.path.isdir(os.path.join(st, "newb")):
        os.rename(os.path.join(st, "newb"), os.path.join(corpus, f"{cluster_col}={b}"))
    # 4. publish the updated centroid table
    cent = os.path.join(path, "centroids")
    if os.path.isdir(os.path.join(st, "centroids")):
        if os.path.isdir(cent):
            shutil.rmtree(os.path.join(st, "oldcent"), ignore_errors=True)
            os.rename(cent, os.path.join(st, "oldcent"))
        os.rename(os.path.join(st, "centroids"), cent)
    # 5. clean up (also removes oldc/oldcent)
    shutil.rmtree(st)


def ivf_split_oversized(
    spark: SparkSession,
    path: str,
    *,
    max_skew: float = 2.0,
    sample_rows: int = 4096,
    seed: int = 42,
    max_iter: int = 10,
    vec_col: str | None = None,
    cluster_col: str = "ivf_cluster",
) -> list[int]:
    """Drift-triggered maintenance: split every cluster whose row count
    exceeds ``max_skew``× the balanced share into two via LOCAL 2-means,
    instead of rebuilding the whole index.

    The frozen-centroid append lifecycle (:func:`ivf_append`) degrades
    exactly one way: drifted mass piles into few clusters, so probes
    into them rescan ever-larger partitions (recall holds, cost
    doesn't — and past one cluster ≫ others, recall too: a fixed
    ``n_probe`` spends its budget inside one giant cell).
    :func:`ivf_index_stats` measures that skew; this acts on it. Per
    oversized cluster: sample its rows (order-invariant hash sample),
    fit 2-means locally (a single cluster's sample — milliseconds),
    reassign ONLY that cluster's rows between the two sub-centroids,
    and commit via the staged-rename protocol in :func:`recover_split`
    (crash anywhere leaves either the old cluster or the completed
    split, never half). The rewrite touches one cluster's rows — at
    100 TB that is ``share`` of the corpus, not the corpus; tombstoned
    ids are dropped for free along the way (the stage reads through
    ``apply_tombstones``), and append/delete/vacuum see a normal flat
    layout afterwards. Returns the ids of the clusters that were split
    (new sub-clusters take fresh ids past the current maximum).

    Streaming-layout corpora (``_batch=*`` epochs from
    ``streaming.pipeline.ivf_insert``) must be folded flat first
    (:func:`ivf_compact`) — raising here beats silently splitting a
    partial view."""
    import glob as _glob
    import json
    import shutil

    from confluent_kafka_vector_search_prompt_inference_spark.operators._kmeans import kmeans_fit

    if _glob.glob(os.path.join(path, "corpus", "_batch=*")):
        raise ValueError(
            "ivf_split_oversized requires a flat cluster-partitioned corpus; "
            "run ivf_compact first to fold the streaming _batch=* epochs"
        )
    split: list[int] = []
    unsplittable: set[int] = set()
    touched: set[int] = set()  # clusters whose dirs this pass rewrote/created
    # ONE corpus aggregation for the whole maintenance pass: counts update
    # incrementally from each split's measured halves (n_b / n_c − n_b)
    # instead of a fresh groupBy per iteration — a many-splits pass was
    # quadratic-ish in corpus scans before.
    corpus, centroids = load_ivf_index(spark, path)
    counts = {
        int(r[cluster_col]): r["n"]
        for r in corpus.groupBy(cluster_col).agg(F.count("*").alias("n")).collect()
    }
    if vec_col is None:
        # fallback inference for corpora with exactly one array column;
        # ambiguous schemas (extra array payloads) must name the column
        arrays = [
            f.name for f in corpus.schema.fields
            if isinstance(f.dataType, ArrayType)
        ]
        if len(arrays) != 1:
            raise ValueError(
                f"cannot infer the indexed vector column from {arrays}; "
                "pass vec_col= explicitly"
            )
        vec_col = arrays[0]
    while True:
        n_clusters = len(centroids)
        total = sum(counts.values())
        if not total:
            return split
        balanced = total / n_clusters
        over = [
            (c, n)
            for c, n in counts.items()
            if n >= max_skew * balanced and n >= 2 and c not in unsplittable
        ]
        if not over:
            return split
        # worst first; one split per iteration (each changes the balance)
        c = max(over, key=lambda t: t[1])[0]
        if c in touched:
            # this cluster's directory was rewritten (or created) by an
            # earlier split in this pass — the loaded DataFrame's file
            # index predates it, so re-list before filtering into it.
            # Untouched clusters keep riding the original load (partition
            # pruning never lists their unchanged sibling dirs).
            corpus, centroids = load_ivf_index(spark, path)
            touched.clear()
        rows_c = corpus.filter(F.col(cluster_col) == c)
        X = _hash_bottom_sample(rows_c, vec_col, sample_rows)
        sub = kmeans_fit(X, 2, seed=seed, max_iter=max_iter)
        b = n_clusters  # fresh id past the current maximum
        assign = _nearest_clusters_udf(sub, n_probe=1)
        halves = rows_c.withColumn(
            "__half", F.element_at(assign(F.col(vec_col)), 1)
        ).localCheckpoint(eager=True)  # assignment runs once, not per half
        n_b = halves.filter(F.col("__half") == 1).count()
        if n_b == 0 or n_b == counts[c]:
            # degenerate (e.g. all-identical vectors): 2-means cannot
            # separate it — skip rather than loop forever
            unsplittable.add(int(c))
            continue
        st = os.path.join(path, "split_tmp")
        shutil.rmtree(st, ignore_errors=True)
        os.makedirs(st)
        data_cols = [col for col in corpus.columns if col != cluster_col]
        halves.filter(F.col("__half") == 0).select(*data_cols).write.parquet(
            os.path.join(st, "newc")
        )
        halves.filter(F.col("__half") == 1).select(*data_cols).write.parquet(
            os.path.join(st, "newb")
        )
        new_cent = np.vstack([centroids, sub[1][None, :]])
        new_cent[c] = sub[0]
        cent_pdf = pd.DataFrame(
            {
                "cluster_id": [int(i) for i in range(len(new_cent))],
                "centroid": [[float(x) for x in row] for row in new_cent],
            }
        )
        spark.createDataFrame(
            cent_pdf, schema="cluster_id int, centroid array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(os.path.join(st, "centroids"))
        with open(os.path.join(st, "plan.json"), "w") as fh:
            json.dump(
                {
                    "cluster": int(c),
                    "new_cluster": int(b),
                    "cluster_col": cluster_col,
                },
                fh,
            )
        with open(os.path.join(st, "_COMMIT"), "w"):
            pass
        recover_split(path, cluster_col=cluster_col)
        split.append(int(c))
        centroids = new_cent
        counts[int(b)] = n_b
        counts[int(c)] = counts[int(c)] - n_b
        touched.update((int(c), int(b)))


def load_ivf_index(spark: SparkSession, path: str) -> tuple[DataFrame, np.ndarray]:
    """(partition-pruned corpus DataFrame, centroid matrix) from disk.
    Tombstoned ids (:func:`ivf_delete`) are anti-joined out — broadcast,
    id-only — so every reader sees deletes immediately, vacuumed or not."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators._index_io import (
        apply_tombstones,
        recover_vacuum,
    )

    recover_vacuum(path)
    recover_split(path)
    corpus_dir = os.path.join(path, "corpus")
    import glob as _glob

    if _glob.glob(os.path.join(corpus_dir, "_batch=*", "_SUCCESS")):
        # streaming layout (streaming/pipeline.ivf_insert): an epoch level
        # above the cluster level gives idempotent replay; both are
        # partition columns, so cluster pruning still holds per batch.
        # Only committed epochs are visible.
        committed = [
            os.path.dirname(s)
            for s in _glob.glob(os.path.join(corpus_dir, "_batch=*", "_SUCCESS"))
        ]
        corpus = (
            spark.read.option("basePath", corpus_dir)
            .parquet(*committed)
            .drop("_batch")
        )
    else:
        corpus = spark.read.parquet(corpus_dir)
    corpus = apply_tombstones(spark, corpus, path)
    rows = (
        spark.read.parquet(os.path.join(path, "centroids"))
        .orderBy("cluster_id")
        .collect()
    )
    centroids = np.asarray([np.asarray(r.centroid, dtype=np.float64) for r in rows])
    return corpus, centroids


def topk_ivf(
    queries: DataFrame,
    indexed_corpus: DataFrame,
    centroids: np.ndarray,
    k: int = 3,
    *,
    query_id: str,
    query_vec: str = "vector",
    corpus_id: str,
    corpus_vec: str = "vector",
    cluster_col: str = "ivf_cluster",
    metric: str = "dot",
    n_probe: int = 4,
    score_col: str = "score",
    rank_col: str = "rank",
    recall_target: float | None = None,
    calibration_sample: int = 32,
    calibration_cache=None,
    corpus_fingerprint: str | None = None,
    query_fingerprint: str | None = None,
    recalibrate: bool = False,
) -> DataFrame:
    """Approximate top-k via IVF probing (see module docstring).

    ``recall_target=`` extends the engine's measured-recall contract
    (``topk_join.calibrate_recall_depth`` — the generalization of the
    reference's ``numCandidates`` knob, ``README.md:364, 368``) to the
    persisted-index tier: instead of guessing ``n_probe``, declare a
    recall floor and :func:`calibrate_ivf_n_probe` measures the probe
    ladder on a query sample and picks the smallest width whose sample
    recall@k meets it. Unlike the binary/LSH tiers this tier can satisfy
    ANY target ≤ 1.0 — the deepest rung probes every cluster, which IS
    the exact scan — so there is no unreachable-target error path.

    Execution shape (round 7): the query matrix collects to the driver
    (the operator's design premise is queries ≪ corpus — the previous
    probe-join shape already materialized every probed query into a
    driver-built broadcast, so this is the same memory at less
    machinery), probe lists are computed driver-side with the SAME
    argpartition math as :func:`_nearest_clusters_udf`, and the probed
    cluster set becomes a STATIC ``isin`` filter on the cluster column —
    compile-time partition pruning on a saved index, no join to drive it.
    Scoring is per-cluster BLAS: each Arrow batch of the pruned corpus
    scan matmuls its clusters' rows against just the queries probing that
    cluster, keeping per-query top-k within the batch, so the only
    shuffle in the whole plan is the k·n_probe·nq-row window finalize.
    The previous shape — explode to (query, cluster) pairs, broadcast-
    hash-join the corpus, score each pair through the Catalyst
    ``vec_dot`` fold — evaluated an interpreted ~64-step lambda chain
    per candidate (6.9M candidates/batch on the 3M-row streaming ladder
    rung) and fed ALL of them to the window; measured there, BLAS
    scoring + k-bounded emit is what lets the probe lane actually
    diverge from the exact-matmul lane instead of giving back its
    pruning win in per-pair interpretation overhead."""
    if recall_target is not None:
        n_probe, _ = calibrate_ivf_n_probe(
            queries, indexed_corpus, centroids, k,
            recall_target=recall_target,
            query_id=query_id, query_vec=query_vec,
            corpus_id=corpus_id, corpus_vec=corpus_vec,
            cluster_col=cluster_col, metric=metric,
            sample_queries=calibration_sample,
            cache=calibration_cache, corpus_fingerprint=corpus_fingerprint,
            query_fingerprint=query_fingerprint, recalibrate=recalibrate,
        )
    from pyspark.sql.types import DoubleType, StructField, StructType

    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import _rowwise_topk

    spark = queries.sparkSession
    out_schema = StructType(
        [
            StructField(query_id, queries.schema[query_id].dataType),
            StructField(corpus_id, indexed_corpus.schema[corpus_id].dataType),
            StructField(score_col, DoubleType()),
        ]
    )
    qpdf = queries.select(F.col(query_id), F.col(query_vec)).toPandas()
    if qpdf.empty:
        empty = spark.createDataFrame([], out_schema)
        return empty.withColumn(rank_col, F.lit(1)).filter(F.lit(False))
    q_ids = qpdf[query_id].to_numpy()
    Q = np.asarray([np.asarray(v, dtype=np.float64) for v in qpdf[query_vec]])
    # price the broadcast query matrix against the same budget the exact
    # tiers use (topk_join._BROADCAST_BUDGET_BYTES prices shipped bytes):
    # the premise is queries ≪ corpus, and a violation should be a clear
    # deterministic error, not a silent driver OOM at 100× the data
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import _BROADCAST_BUDGET_BYTES
    if Q.nbytes > _BROADCAST_BUDGET_BYTES:
        raise ValueError(
            f"topk_ivf query matrix is {Q.nbytes} float64 bytes "
            f"(> broadcast budget {_BROADCAST_BUDGET_BYTES}); the IVF probe "
            "tier assumes queries ≪ corpus. For a huge query side use "
            "topk_similarity_join(strategy='shuffle'/'auto') or chunk the "
            "queries."
        )
    cent = centroids.astype(np.float64)
    # same selection math as _nearest_clusters_udf (argpartition on the
    # identical float64 distance matrix) — probe SETS are bit-identical
    d2 = (Q**2).sum(axis=1)[:, None] - 2.0 * (Q @ cent.T) + (cent**2).sum(axis=1)[None, :]
    p = min(n_probe, cent.shape[0])
    sel = np.argpartition(d2, p - 1, axis=1)[:, :p]
    cluster_to_q: dict[int, list[int]] = {}
    for qi in range(sel.shape[0]):
        for c in sel[qi]:
            cluster_to_q.setdefault(int(c), []).append(qi)
    qnorm = np.linalg.norm(Q, axis=1)
    bc = spark.sparkContext.broadcast(
        (q_ids, Q, {c: np.asarray(v) for c, v in cluster_to_q.items()}, qnorm)
    )
    kk, met = k, metric

    def compute(batches):
        ids_b, Qb, cq, qn = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            clusters = pdf[cluster_col].to_numpy()
            vecs = pdf[corpus_vec].to_numpy()
            all_cids = pdf[corpus_id].to_numpy()
            frames = []
            for c in np.unique(clusters):
                qidx = cq.get(int(c))
                if qidx is None:
                    continue
                rows = np.flatnonzero(clusters == c)
                C = np.asarray(
                    [np.asarray(vecs[r], dtype=np.float64) for r in rows]
                )
                cids = all_cids[rows]
                S = Qb[qidx] @ C.T
                if met == "cosine":
                    cn = np.linalg.norm(C, axis=1)
                    cn[cn == 0] = np.inf  # zero vectors score -0.0 → rank last
                    qq = qn[qidx].copy()
                    qq[qq == 0] = np.inf
                    S = S / qq[:, None] / cn[None, :]
                # round BEFORE the partial top-k so in-batch ordering uses
                # the same (−rounded score, id) key the window finalizes on
                S = np.round(S, 6)
                idx, top = _rowwise_topk(S, cids, kk)
                w = idx.shape[1]
                frames.append(
                    pd.DataFrame(
                        {
                            query_id: np.repeat(ids_b[qidx], w),
                            corpus_id: cids[idx].ravel(),
                            score_col: top.ravel(),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scan = indexed_corpus.select(
        F.col(corpus_id), F.col(corpus_vec), F.col(cluster_col)
    ).filter(F.col(cluster_col).isin(sorted(cluster_to_q)))
    cand = scan.mapInPandas(compute, out_schema)
    w = Window.partitionBy(query_id).orderBy(F.desc(score_col), F.asc(corpus_id))
    return cand.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


#: probe-width ladder: powers of two, topped by the full cluster count
#: (probing every cluster IS the exact scan, so the deepest rung's recall
#: is 1.0 and any target ≤ 1.0 is reachable on this tier).
def _probe_ladder(n_clusters: int) -> list[int]:
    ladder = []
    p = 1
    while p < n_clusters:
        ladder.append(p)
        p *= 2
    ladder.append(n_clusters)
    return ladder


def calibrate_ivf_n_probe(
    queries: DataFrame,
    indexed_corpus: DataFrame,
    centroids: np.ndarray,
    k: int,
    *,
    recall_target: float,
    query_id: str,
    query_vec: str = "vector",
    corpus_id: str,
    corpus_vec: str = "vector",
    cluster_col: str = "ivf_cluster",
    metric: str = "dot",
    sample_queries: int = 32,
    cache=None,
    corpus_fingerprint: str | None = None,
    query_fingerprint: str | None = None,
    recalibrate: bool = False,
) -> tuple[int, float]:
    """Measured-recall probe-width selection for the persisted-IVF tier —
    the ``recall_target=`` contract (``topk_join.calibrate_recall_depth``)
    extended to the tier real deployments ride past the broadcast wall
    (the streaming ladder's measured crossover at ~1M corpus rows).

    Returns ``(n_probe, measured_recall)``: the smallest rung on the
    power-of-two probe ladder whose recall@k on a ``sample_queries``-query
    sample meets the target. Cost shape mirrors the binary/LSH
    calibrators — TWO corpus passes total: one exact ground-truth pass
    (sample broadcast, corpus streamed), and one probe pass at the
    DEEPEST rung. Probe lists are prefix-monotone in width
    (:func:`_nearest_clusters_udf` orders by centroid distance), and the
    prefix top-k at any width lives inside the union of per-cluster
    top-k, so every shallower rung is priced from the same pass: the
    driver-side pandas holds ≤ sample·n_clusters·k rows. The deepest
    rung probes every cluster — the exact scan — so any target ≤ 1.0 is
    satisfiable; there is no unreachable-target error path on this tier
    (unlike the capped binary/LSH ladders).

    ``cache`` (an ``operators.calibration_cache.CalibrationCache``) makes
    repeat calls against an unchanged index FREE — zero Spark jobs: the
    full curve persists against the calibration inputs plus a job-free
    corpus fingerprint. Pass ``corpus_fingerprint=
    calibration_cache.directory_fingerprint(index_path)`` for a persisted
    index (any append/vacuum/split invalidates via file metadata);
    without it the fingerprint falls back to Catalyst plan-stats bytes.
    The cached curve embeds this call's QUERY sample too — reuse assumes
    a stationary query distribution. ``query_fingerprint`` folds a
    caller-supplied workload fingerprint into the key (a shifted
    workload then re-measures; leave None when micro-batches vary but
    the distribution doesn't, or every batch re-pays the scans);
    ``recalibrate=True`` bypasses the lookup once and stores fresh."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import (
        _metric_score,
        topk_similarity_join,
    )

    if not 0.0 < recall_target <= 1.0:
        raise ValueError(f"recall_target must be in (0, 1], got {recall_target}")
    n_clusters = len(centroids)
    ladder = _probe_ladder(n_clusters)
    cache_key = None
    if cache is not None:
        from confluent_kafka_vector_search_prompt_inference_spark.operators.calibration_cache import dataframe_fingerprint

        cache_key = {
            "op": "ivf_n_probe",
            "k": k,
            "metric": metric,
            "sample_queries": sample_queries,
            "n_clusters": n_clusters,
            "corpus": corpus_fingerprint or dataframe_fingerprint(indexed_corpus),
        }
        if query_fingerprint is not None:
            cache_key["queries"] = query_fingerprint
        cached = None if recalibrate else cache.lookup(cache_key)
        if cached is not None and all(p in cached for p in ladder):
            return _pick_probe_width(cached, ladder, recall_target)
    # deterministic sample (hash-ordered, mirrored by
    # query_sample_fingerprint) — a bare limit() drifts across sessions
    sample = (
        queries.select(F.col(query_id), F.col(query_vec))
        .orderBy(F.xxhash64(F.col(query_id), F.col(query_vec)), F.col(query_id))
        .limit(sample_queries)
        .localCheckpoint(eager=True)
    )
    exact = topk_similarity_join(
        sample, indexed_corpus.select(F.col(corpus_id), F.col(corpus_vec)), k,
        query_id=query_id, query_vec=query_vec,
        corpus_id=corpus_id, corpus_vec=corpus_vec,
        metric=metric, strategy="broadcast_queries",
    ).select(query_id, corpus_id).toPandas()
    if exact.empty:
        raise ValueError("cannot calibrate recall on an empty query sample")

    # one probe pass at full width: every (sample query, cluster) pair,
    # keeping per-(query, cluster) top-k only — the sample·n_clusters-row
    # probe side broadcasts, the corpus streams past it in place
    assign = _nearest_clusters_udf(centroids, n_clusters)
    probed = sample.select(
        F.col(query_id),
        F.col(query_vec).alias("__qv"),
        F.posexplode(assign(F.col(query_vec))).alias("__pr0", cluster_col),
    )
    corpus_narrow = indexed_corpus.select(
        F.col(corpus_id), F.col(corpus_vec).alias("__cv"), F.col(cluster_col)
    )
    scored = F.broadcast(probed).join(corpus_narrow, cluster_col).select(
        query_id,
        corpus_id,
        (F.col("__pr0") + 1).alias("__probe_rank"),
        F.round(_metric_score(metric, F.col("__qv"), F.col("__cv")), 6).alias(
            "__escore"
        ),
    )
    wqc = Window.partitionBy(query_id, "__probe_rank").orderBy(
        F.desc("__escore"), F.asc(corpus_id)
    )
    pool = (
        scored.withColumn("__r", F.row_number().over(wqc))
        .filter(F.col("__r") <= k)
        .drop("__r")
        .toPandas()
    )

    truth = {
        q: set(g[corpus_id]) for q, g in exact.groupby(query_id, sort=False)
    }
    possible = len(exact)
    # measure EVERY rung (cheap pandas over the one pooled pass) so the
    # cached curve serves any future recall_target without re-scanning
    curve: dict[int, float] = {}
    for p in ladder:
        sub = pool[pool["__probe_rank"] <= p]
        sub = sub.sort_values(
            [query_id, "__escore", corpus_id], ascending=[True, False, True]
        )
        topk = sub.groupby(query_id, sort=False).head(k)
        hits = sum(
            cid in truth.get(qid, ())
            for qid, cid in zip(topk[query_id], topk[corpus_id])
        )
        curve[p] = hits / possible
    if cache is not None:
        cache.store(cache_key, curve)
    return _pick_probe_width(curve, ladder, recall_target)


def _pick_probe_width(
    curve: dict[int, float], ladder: list[int], recall_target: float
) -> tuple[int, float]:
    for p in ladder:
        if curve[p] >= recall_target:
            return p, curve[p]
    # defensively unreachable: the deepest rung probes every cluster
    # (recall 1.0 up to score-rounding ties)
    raise ValueError(
        f"recall_target={recall_target} not met even probing all "
        f"{ladder[-1]} clusters: measured curve {curve} (score-rounding "
        "tie pathology — lower the target marginally)"
    )
