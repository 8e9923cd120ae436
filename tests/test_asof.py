"""As-of join semantics: latest at-or-before match, exact-tie inclusion,
no-match nulls, tolerance bound."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "p1"),
            (1, _ts("2024-01-01T12:00:00"), "p2"),
            (2, _ts("2024-01-01T09:00:00"), "p3"),  # before any right row
            (3, _ts("2024-01-01T10:00:00"), "p4"),  # exact tie with right
        ],
        "user_id int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 100.0),
            (1, _ts("2024-01-01T11:00:00"), 200.0),
            (2, _ts("2024-01-01T09:30:00"), 300.0),
            (3, _ts("2024-01-01T10:00:00"), 400.0),
        ],
        "user_id int, ts timestamp, price double",
    )
    return left, right


def test_latest_at_or_before(spark, frames):
    left, right = frames
    out = {r.tag: r.price for r in asof_join(left, right, on="user_id", ts="ts").collect()}
    assert out == {"p1": 100.0, "p2": 200.0, "p3": None, "p4": 400.0}


def test_exact_tie_matches(spark, frames):
    left, right = frames
    row = [r for r in asof_join(left, right, on="user_id", ts="ts").collect() if r.tag == "p4"][0]
    assert row.price == 400.0 and row.ts_right == _ts("2024-01-01T10:00:00")


def test_tolerance_bound(spark, frames):
    left, right = frames
    out = {
        r.tag: r.price
        for r in asof_join(left, right, on="user_id", ts="ts", within="30 minutes").collect()
    }
    # p1: 09:30 is exactly 30 min before 10:00 → within; p2: 11:00 is 60 min
    # before 12:00 → dropped
    assert out == {"p1": 100.0, "p2": None, "p3": None, "p4": 400.0}


def test_name_collision_suffix(spark, frames):
    left, right = frames
    right2 = right.withColumnRenamed("price", "tag")  # collides with left.tag
    out = asof_join(left, right2, on="user_id", ts="ts")
    assert "tag_right" in out.columns and "tag" in out.columns
