"""Sink-table schema evolution (reference ``README.md:610-612``: on a data
contract change "the table will automatically update").

Covers the full flow: a sink written under contract v1, an evolving insert
that adds a column, mergeSchema read-back (old rows NULL in the new
column), registry contract version bump, and rejection of breaking changes
(drop / retype) on both the catalog and registry sides."""

import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.catalog import (
    Catalog,
    SinkSchemaMismatch,
    evolve_sink_schema,
)
from confluent_kafka_vector_search_prompt_inference_spark.sources.registry import SchemaRegistry


@pytest.fixture()
def sink(spark, tmp_path):
    """A catalog with one sink table holding two v1 rows."""
    cat = Catalog(spark)
    path = str(tmp_path / "user_prompts")
    v1 = spark.createDataFrame(
        [("user", "q1", "s-1"), ("user", "q2", "s-2")],
        "role string, content string, sessionid string",
    )
    v1.write.parquet(path)
    cat.add_table("user_prompts", path)
    return cat


def test_strict_insert_rejects_new_column(spark, sink):
    wider = spark.createDataFrame(
        [("user", "q3", "s-3", "[]")],
        "role string, content string, sessionid string, products string",
    )
    with pytest.raises(SinkSchemaMismatch, match="Column sets"):
        sink.insert_into("user_prompts", wider)


def test_evolving_insert_widens_sink(spark, sink):
    wider = spark.createDataFrame(
        [("user", "q3", "s-3", "[]")],
        "role string, content string, sessionid string, products string",
    )
    sink.insert_into("user_prompts", wider, evolve=True)
    out = sink.table("user_prompts")
    # union schema: the new column exists table-wide
    assert "products" in out.columns
    rows = {r.sessionid: r for r in out.collect()}
    assert len(rows) == 3
    # pre-evolution rows read back as NULL in the added column
    assert rows["s-1"].products is None and rows["s-2"].products is None
    assert rows["s-3"].products == "[]"
    # catalog contract updated: a follow-up strict insert must carry the
    # evolved schema
    assert [f.name for f in sink.schema("user_prompts").fields] == [
        "role", "content", "sessionid", "products",
    ]
    follow_up = spark.createDataFrame(
        [("user", "q4", "s-4", "[]")],
        "role string, content string, sessionid string, products string",
    )
    sink.insert_into("user_prompts", follow_up)
    assert sink.table("user_prompts").count() == 4


def test_evolving_insert_rejects_drop_and_retype(spark, sink):
    dropped = spark.createDataFrame([("user", "q")], "role string, content string")
    with pytest.raises(SinkSchemaMismatch, match="drops columns"):
        sink.insert_into("user_prompts", dropped, evolve=True)
    retyped = spark.createDataFrame(
        [("user", "q", 1)], "role string, content string, sessionid bigint"
    )
    with pytest.raises(SinkSchemaMismatch, match="changes type"):
        sink.insert_into("user_prompts", retyped, evolve=True)


def test_evolve_sink_schema_appends_in_query_order():
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    sink_schema = StructType([StructField("a", StringType())])
    query = StructType(
        [
            StructField("a", StringType()),
            StructField("b", LongType()),
            StructField("c", StringType()),
        ]
    )
    out = evolve_sink_schema(sink_schema, query)
    assert [f.name for f in out.fields] == ["a", "b", "c"]


def test_registry_evolve_bumps_version_and_checks_compat():
    reg = SchemaRegistry()
    reg.register("t", '{"type":"object","properties":{"a":{"type":"string"}}}')
    assert reg.version("t") == 1
    v2 = reg.evolve(
        "t",
        '{"type":"object","properties":{"a":{"type":"string"},"b":{"type":"integer"}}}',
    )
    assert v2 == 2 and reg.version("t") == 2
    assert [f.name for f in reg.latest("t").fields] == ["a", "b"]
    with pytest.raises(ValueError, match="drops fields"):
        reg.evolve("t", '{"type":"object","properties":{"a":{"type":"string"}}}')
    with pytest.raises(ValueError, match="changes type"):
        reg.evolve(
            "t",
            '{"type":"object","properties":{"a":{"type":"integer"},"b":{"type":"integer"}}}',
        )
