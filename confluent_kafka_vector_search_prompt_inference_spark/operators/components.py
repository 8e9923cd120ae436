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
iterations (no exponential re-execution at scale). Duplicate graphs are
near-cliques, so min-label closes them in 3-4 rounds; for long PATH
components (diameter Θ(n), where min-label needs Θ(n) rounds) the
``algorithm="star"`` variant implements alternating large-star /
small-star (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14): each phase is one window-min over the node's
neighborhood, and the edge set contracts toward star forests in
O(log n) alternations regardless of diameter. ``algorithm="auto"``
(the default) runs min-label and hands the still-changing label set to
the star variant once the propagation round budget is exhausted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as distinct (a > b) pairs, self-loops dropped."""
    return (
        edges.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _large_star(canon: DataFrame) -> DataFrame:
    """For every node u: connect each strictly-larger neighbor v to
    min(Γ(u) ∪ {u}). One shuffle (window over node id)."""
    sym = canon.unionByName(
        canon.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    w = Window.partitionBy("a")
    withm = sym.withColumn("m", F.least(F.col("a"), F.min("b").over(w)))
    return _canonical(
        withm.filter(F.col("b") > F.col("a")).select(
            F.col("b").alias("a"), F.col("m").alias("b")
        )
    )


def _small_star(canon: DataFrame) -> DataFrame:
    """Edges oriented larger→smaller; for every node u: connect each
    (≤ u) neighbor — and u itself — to min(Γ⁻(u)). One shuffle."""
    w = Window.partitionBy("a")
    withm = canon.withColumn("m", F.min("b").over(w))
    nbrs = withm.select(F.col("b").alias("a"), F.col("m").alias("b"))
    selfs = withm.select("a", F.col("m").alias("b"))
    return _canonical(nbrs.unionByName(selfs))


def _star_components(canon: DataFrame, max_iterations: int) -> DataFrame:
    """Alternate large-star/small-star until the canonical edge set is
    stable — at the fixed point every edge is (node, component-min), so
    labels read straight off the edges. Converges in O(log n)
    alternations even on diameter-Θ(n) path graphs, where min-label
    propagation needs Θ(n) rounds."""
    # lazy checkpoints: each materializes inside the first action that
    # reads it (the nxt.count() below) instead of paying a dedicated
    # job per checkpoint — see the label loop note in
    # connected_components
    nodes = (
        canon.select(F.col("a").alias("node"))
        .unionByName(canon.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cur = canon.localCheckpoint(eager=False)
    for _ in range(max_iterations):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        # star forests are a fixed point of both phases, so "unchanged
        # edge set" is exactly convergence; sizes first (cheap), then a
        # one-sided subtract (both sets are distinct + equal-sized).
        if nxt.count() == cur.count() and nxt.subtract(cur).isEmpty():
            cur = nxt
            break
        cur = nxt
    parents = cur.groupBy(F.col("a").alias("node")).agg(
        F.min("b").alias("component")
    )
    return (
        nodes.join(parents, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
    algorithm: str = "auto",
    label_round_budget: int = 6,
) -> DataFrame:
    """Return ``(node, component)`` where component = min node id reachable
    over the undirected edge set. Each iteration shuffles (node, label)
    pairs only — never payload columns.

    ``algorithm``: ``"label"`` = min-label propagation (optimal on the
    near-clique graphs dedup produces), ``"star"`` = alternating
    large-star/small-star (O(log n) rounds on any diameter), ``"auto"`` =
    min-label first, escalating to star if labels still change after
    ``label_round_budget`` rounds (an adversarial long-path graph)."""
    if algorithm not in ("auto", "label", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if algorithm == "star":
        return _star_components(
            _canonical(edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))),
            max_iterations,
        )
    # LAZY checkpoints throughout the loop (round 12 optimization): an
    # eager localCheckpoint is its own Spark job, so the label loop paid
    # 2 jobs per round (materialize + changed-count) plus 2 upfront —
    # pure scheduling overhead on small duplicate graphs and a full
    # extra pass per round at scale. Each lazy checkpoint materializes
    # inside the FIRST action that reads it (here: the very next count),
    # halving the job count with identical lineage-truncation semantics.
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # Size the iteration parallelism to the GRAPH, not the session default:
    # dup graphs are usually orders of magnitude smaller than the corpus
    # (most docs have no dup edge), and each of the ~3-4 label rounds pays
    # per-partition task overhead. ~100k edges per partition keeps a round
    # one task on small graphs and thousands of tasks at the 100 TB tier.
    # With the lazy checkpoint above, this count IS the materializing
    # action: it pays the full symmetrize build once, and the checkpoint
    # rides along (cost moved into the count, not removed).
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
        sym = sym.repartition(n_part, "b").localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=False)
    )
    rounds = (
        min(max_iterations, label_round_budget)
        if algorithm == "auto"
        else max_iterations
    )
    n_changed = 0
    for _ in range(rounds):
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
        # lazy: the changed-count below materializes the checkpoint in
        # the same job it counts in
        updated = updated.localCheckpoint(eager=False)
        n_changed = updated.filter(F.col("changed")).count()
        labels = updated.drop("changed")
        if n_changed == 0:
            break
    if algorithm == "auto" and n_changed > 0:
        # Labels still moving after the budget: the graph has long paths
        # (min-label needs Θ(diameter) rounds). Escalate to the star
        # algorithm, seeding it with the partial labels as extra edges —
        # (node, label) is a proven reachability fact, so the union has
        # identical components and the head start carries over.
        seed = labels.filter(F.col("node") != F.col("component")).select(
            F.col("node").alias("a"), F.col("component").alias("b")
        )
        return _star_components(
            _canonical(sym.unionByName(seed)), max_iterations
        )
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
