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
