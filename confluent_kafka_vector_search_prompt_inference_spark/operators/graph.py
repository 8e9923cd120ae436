"""Graph analytics over edge DataFrames — triangle counting via
degree-oriented wedge closure.

The naive triangle join (adjacency self-join on every shared vertex)
explodes on high-degree hubs: a degree-D vertex contributes D² wedge
rows. The fix every distributed triangle counter uses (Suri & Vassilvitskii,
"Counting Triangles and the Curse of the Last Reducer", WWW 2011) is to
orient each undirected edge from its lower-degree endpoint to its
higher-degree endpoint (ties broken by id, making a total order). Then:

- every out-degree is bounded by O(√m) — a hub's edges point INTO it, so
  the hub never fans out wedges;
- every triangle has exactly one vertex with two out-edges along the
  orientation, so counting (wedge ∧ closing-edge) counts each triangle
  exactly once, no multiplicity division.

Spark shape, sized for 100 TB: degrees are one groupBy over the edge
list; the orientation is two joins against that node-sized table (hash
join on node id — broadcastable while the vocabulary of nodes is small,
shuffle otherwise); wedges come from ONE self-join of the oriented edge
list on the source vertex (out-degree-bounded, so no hub quadratic); the
closure check is ONE more join on the (dst₁, dst₂) pair. Everything
shuffles ids only — never payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle participation over an undirected simple graph.

    ``edges`` must be canonical (one row per undirected edge, ``src <
    dst``, no self-loops). Returns ``(node, degree, tri_cnt,
    clustering)`` for every node in ≥ 1 triangle, where ``clustering`` is
    the local clustering coefficient ``2·tri / (deg·(deg−1))`` rounded to
    6 decimals (exact: small-integer ratio).

    The edge list and the oriented edge list each feed three consumers
    (degrees + both wedge sides + the closure probe), so both are cut
    with ``localCheckpoint`` — the upstream edge build (often itself a
    join+aggregate) is paid once, and repeated library-style invocation
    leaves no persisted partitions behind.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=False
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
        # node-sized, consumed three times (both orientation sides + the
        # final clustering join) — cut like e/oriented so the union-agg
        # over the edge list runs once
        .localCheckpoint(eager=False)
    )

    # Orient a—b from the (degree, id)-smaller endpoint to the larger.
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("__db"))
    ed = e.join(da, "a").join(db, "b")
    a_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("__db")).otherwise(F.col("__da")).alias("__dv"),
    ).localCheckpoint(eager=False)

    # Wedges u→v, u→w with ord(v) < ord(w); out-degree bound kills the
    # hub quadratic. The closing edge is oriented v→w by construction
    # (same total order), so one equi-join closes the wedge.
    x = oriented.select(F.col("u"), F.col("v"), F.col("__dv").alias("__d1"))
    y = oriented.select(
        F.col("u"), F.col("v").alias("w"), F.col("__dv").alias("__d2")
    )
    wedges = x.join(y, "u").filter(
        (F.col("__d1") < F.col("__d2"))
        | ((F.col("__d1") == F.col("__d2")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(F.col("u").alias("v"), F.col("v").alias("w"))
    tris = wedges.join(closing, ["v", "w"]).select("u", "v", "w")

    # one corner row per triangle endpoint via explode — the three-way
    # union form rebuilt the wedge+closing joins once PER CORNER (the
    # optimizer does not share the common subtree across union branches:
    # plans/r12/part_triangle_counts_before.txt shows the two
    # SortMergeJoins three times), tripling the query's heavy stages
    per_node = (
        tris.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("tri_cnt"))
    )
    return per_node.join(deg, "node").select(
        "node",
        "degree",
        "tri_cnt",
        F.round(
            F.lit(2.0)
            * F.col("tri_cnt").cast("double")
            / (F.col("degree").cast("double") * (F.col("degree").cast("double") - 1.0)),
            6,
        ).alias("clustering"),
    )
