"""Scale-property assertions on physical plans (SURVEY.md §4): pushdown
reaches the scan, projections prune columns, small sides broadcast, the
relational hot path stays in whole-stage codegen."""

import __spark_entry__ as entry
from confluent_kafka_vector_search_prompt_inference_spark.plans import (
    codegen_stage_count,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schemas,
)


def test_filter_reaches_parquet_scan(spark, sf_correct):
    df = entry.filter_pushdown_project(spark, sf_correct)
    pf = pushed_filters(df)
    assert any("l_quantity" in f for f in pf), pf
    assert any("l_shipdate" in f for f in pf), pf


def test_projection_prunes_columns(spark, sf_correct):
    df = entry.filter_pushdown_project(spark, sf_correct)
    schemas = read_schemas(df)
    assert schemas, "no scan found"
    # lineitem has 11 columns; the query needs 6 (incl. filter cols)
    assert all("l_returnflag" not in s for s in schemas), schemas
    assert all("l_partkey" not in s for s in schemas), schemas


def test_q3_broadcasts_dimension(spark, sf_correct):
    assert has_broadcast_join(entry.q3_shipping_priority(spark, sf_correct))


def test_q5_broadcasts_all_dims(spark, sf_correct):
    plan = formatted_plan(entry.q5_region_revenue(spark, sf_correct))
    # the only SortMergeJoin allowed is lineitem⋈orders (two fact tables)
    assert plan.count("SortMergeJoin") <= 1, plan


def test_relational_plan_is_codegened(spark, sf_correct):
    # AQE wraps the plan and hides codegen ids until execution; inspect the
    # static plan (the codegen decision is the same either way).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = entry.q1_pricing_summary(spark, sf_correct)
        assert codegen_stage_count(df) >= 1
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_topk_broadcast_has_no_shuffle(spark, sf_correct):
    """The broadcast-corpus top-k is a pure map — no Exchange in the plan."""
    df = entry.vec_topk_broadcast(spark, sf_correct)
    assert "Exchange" not in formatted_plan(df)


def test_q4_semi_join_shape(spark, sf_correct):
    """EXISTS compiles to a LeftSemi join (no row explosion) with the
    range predicate as a join residual, and the date filter reaches the
    orders scan."""
    df = entry.q4_order_priority(spark, sf_correct)
    plan = formatted_plan(df)
    assert "LeftSemi" in plan, plan
    assert any("o_orderdate" in f for f in pushed_filters(df))


def test_q18_aggregate_then_broadcast(spark, sf_correct):
    """The HAVING-filtered key set broadcasts into orders/customer — the
    only shuffle left is the lineitem groupBy on its natural key."""
    assert has_broadcast_join(entry.q18_large_volume(spark, sf_correct))


def test_q19_part_side_broadcasts(spark, sf_correct):
    assert has_broadcast_join(entry.q19_disjunctive_revenue(spark, sf_correct))


def test_dataset_split_is_narrow(spark, sf_correct):
    """Content-hash split adds no Exchange: split assignment is map-side."""
    from confluent_kafka_vector_search_prompt_inference_spark.operators.sampling import dataset_split

    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    df = dataset_split(docs, "doc_id", {"train": 0.9, "test": 0.1})
    assert "Exchange" not in formatted_plan(df)


def test_hierarchical_rollup_two_aggs_one_scan(spark, sf_correct):
    """The rollup re-aggregates minute partials: exactly one scan of the
    events table feeds both aggregation levels."""
    df = entry.events_hierarchical_rollup(spark, sf_correct)
    assert len(read_schemas(df)) == 1, formatted_plan(df)


def test_static_partition_pruning(spark, tmp_path):
    """A filter on the partition column must become a PartitionFilter (no
    data files outside the matching directory are even listed)."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(500)
    path = str(tmp_path / "ev_parted")
    ev.write.partitionBy("event_type").parquet(path)
    df = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200], plan
    expected = ev.filter(F.col("event_type") == "click").count()
    assert df.count() == expected


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """Joining a partitioned fact to a filtered dimension must inject a
    runtime (dynamicpruning) partition filter into the fact scan — the
    mechanism that keeps star joins from scanning every partition at
    100 TB."""
    from pyspark.sql import functions as F

    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    path = str(tmp_path / "orders_parted")
    orders.write.partitionBy("o_orderpriority").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("1-URGENT", "hot"), ("5-LOW", "cold")], ["prio", "tier"]
    ).filter(F.col("tier") == "hot")
    j = fact.join(dim, fact.o_orderpriority == dim.prio).groupBy("tier").count()
    plan = formatted_plan(j)
    assert "dynamicpruning" in plan.lower(), plan
    rows = {r.tier: r["count"] for r in j.collect()}
    expected = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert rows == {"hot": expected}


def test_q2_single_data_shuffle(spark, sf_correct):
    """hash(p_partkey) serves both the (part, supplier) aggregate and the
    per-part window — exactly one non-broadcast exchange in the plan."""
    plan = formatted_plan(entry.q2_min_cost_supplier(spark, sf_correct))
    tree = plan.split("(1) Scan")[0]
    data_exchanges = [
        l for l in tree.splitlines()
        if "Exchange" in l and "BroadcastExchange" not in l
    ]
    assert len(data_exchanges) == 1, tree


def test_bloom_filter_join_pruning(spark, tmp_path):
    """Runtime bloom-filter injection: a selective dim filter plants a
    might-contain probe on the fact scan side — the row-level companion to
    dynamic partition pruning for unpartitioned 100 TB facts."""
    from pyspark.sql import functions as F

    old = spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    creation = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB"
    )
    app_thresh = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "10GB"
    )
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
    # test tables are tiny — drop the size gates that target real 100 TB scans
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ so bloom applies
    try:
        li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
        orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy("o_orderpriority").count()
        plan = formatted_plan(j)
        assert "bloom" in plan.lower() or "might_contain" in plan.lower(), plan[:3000]
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", old)
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", creation)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", app_thresh
        )
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_subsequence_topk_is_take_ordered(spark, sf_correct):
    """The global top-20 must compile to TakeOrderedAndProject (per-task
    20-row heaps, driver merges 20-row lists) — never a WindowExec with an
    empty partition spec, which funnels the corpus-sized candidate set
    through one task (the round-3 scale-killer)."""
    df = entry.queries()["subsequence_similarity_search"](spark, sf_correct)
    tree = formatted_plan(df)
    assert "TakeOrderedAndProject" in tree
    assert "Window" not in tree.split("(1) Scan")[0]


def test_filtered_vector_search_pushes_label_predicate(spark, sf_correct):
    """vec_topk_filtered's metadata predicate must reach the parquet scan
    of the corpus side (the one the broadcast strategy collects): the
    broadcast matrix is then built from the filtered subset only, so a
    selective filter shrinks the index set proportionally at 100 TB."""
    df = entry._vec_corpus_filtered(spark, sf_correct)
    pf = pushed_filters(df)
    assert any("label" in f for f in pf), pf
    assert any("vec_id" in f for f in pf), pf
