"""Clustered writes produce tight row-group statistics (data skipping)."""

from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.sources.layout import (
    clustered_write,
    clustering_overlap,
    row_group_ranges,
)


def test_clustered_layout_tightens_row_groups(spark, tmp_path, sf_correct):
    li = spark.read.parquet(f"{sf_correct}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_extendedprice"
    )
    shuffled = li.orderBy(F.rand(42))  # worst-case incoming order

    plain = str(tmp_path / "plain")
    shuffled.repartition(8).write.parquet(plain)
    clustered = str(tmp_path / "clustered")
    clustered_write(shuffled, clustered, ["l_shipdate"], num_files=8)

    plain_overlap = clustering_overlap(row_group_ranges(plain, "l_shipdate"))
    clus_overlap = clustering_overlap(row_group_ranges(clustered, "l_shipdate"))
    # random layout: every row group spans ~the whole date range;
    # clustered: each spans ~1/8th.
    assert plain_overlap > 0.9, plain_overlap
    assert clus_overlap < 0.25, clus_overlap

    # same rows either way
    assert (
        spark.read.parquet(clustered).count()
        == spark.read.parquet(plain).count()
    )


def test_clustered_write_rejects_empty_cols(spark, tmp_path):
    import pytest

    df = spark.range(10)
    with pytest.raises(ValueError):
        clustered_write(df, str(tmp_path / "x"), [])
