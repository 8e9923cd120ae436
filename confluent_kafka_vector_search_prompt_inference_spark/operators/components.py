"""Connected components + duplicate-cluster resolution.

Not in the reference (SURVEY.md §2.11). The last mile of a dedup pipeline:
candidate pairs (MinHash/SimHash/Jaccard — operators/dedup.py) form a
graph whose connected components are duplicate CLUSTERS; each cluster
keeps one representative and drops the rest.

Algorithm: iterative min-label propagation, expressed as DataFrame joins —
every iteration is one shuffle on node id (join edges⋈labels, groupBy-min),
and convergence is detected with a cheap changed-row count. Duplicate
graphs are near-cliques (diameter ≤ 2-3 in practice), so 3-4 iterations
close them; ``max_iterations`` bounds adversarial chains. Lineage is
truncated with ``localCheckpoint`` each round so the plan stays flat over
iterations (no exponential re-execution at scale). For graphs with long
path components at the 100 TB tier, swap the propagation loop for the
large-star/small-star variant — the per-iteration building blocks
(join + groupBy-min) are the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Return ``(node, component)`` where component = min node id reachable
    over the undirected edge set. Each iteration shuffles (node, label)
    pairs only — never payload columns."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Size the iteration parallelism to the GRAPH, not the session default:
    # dup graphs are usually orders of magnitude smaller than the corpus
    # (most docs have no dup edge), and each of the ~3-4 label rounds pays
    # per-partition task overhead. ~100k edges per partition keeps a round
    # one task on small graphs and thousands of tasks at the 100 TB tier.
    # The count is free — sym was just materialized by the checkpoint.
    n_edges = sym.count()
    cur_parts = sym.rdd.getNumPartitions()
    # Sized by the edge count ALONE — deliberately allowed to exceed the
    # incoming partition count, so a huge edge set arriving through a
    # coalesced upstream (few fat partitions) still fans out to thousands
    # of tasks per label round. The cap is a runaway guard, not a clamp to
    # current parallelism.
    n_part = max(1, min(100_000, n_edges // 100_000 + 1))
    if n_part != cur_parts:
        # only re-shuffle + re-materialize when the width actually changes;
        # an unconditional repartition would double-copy the edge set
        sym = sym.repartition(n_part, "b").localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        # min label among each node's neighbors
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(sym.a.alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least("component", F.coalesce("nbr_min", "component")).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("changed")).count()
        labels = updated.drop("changed")
        if n_changed == 0:
            break
    return labels


def dedup_clusters(
    pairs: DataFrame,
    all_ids: DataFrame,
    id_col: str,
    left_col: str = "id_a",
    right_col: str = "id_b",
) -> DataFrame:
    """Resolve candidate duplicate ``pairs`` into cluster assignments over
    the full corpus: ``(id, canonical_id, is_duplicate)``. Singleton docs
    (no dup edge) are their own canonical. The representative is the min
    id in each component — deterministic and engine-portable."""
    comp = connected_components(pairs, src=left_col, dst=right_col)
    return (
        all_ids.select(F.col(id_col).alias("id"))
        .join(comp, F.col("id") == comp.node, "left")
        .select(
            "id",
            F.coalesce("component", "id").alias("canonical_id"),
            (F.coalesce("component", "id") != F.col("id")).alias("is_duplicate"),
        )
    )
