"""Recorded-wire-bytes contract test for the Kafka decode path (S1/S2).

No broker exists in this environment, so the next-best end-to-end evidence
is byte-exact wire records: rows carrying the FULL Spark Kafka connector
schema (key, value, topic, partition, offset, timestamp, timestampType)
whose value bytes are constructed independently of the engine's own
serializer —

- Confluent Schema-Registry JSON_SR framing: magic ``0x00`` + 4-byte
  big-endian schema id + JSON UTF-8, the real producer wire format behind
  the reference's ``'value.format'='json-registry'`` (``README.md:272``);
- bare JSON UTF-8 (console producer).

``decode_json_topic`` must decode both, per record, with no UDF. Against a
real cluster the same DataFrame arrives from
``kafka_reader(...).load()`` — the decode stage under test is identical.
"""

import datetime
import json
import struct

import pytest

from confluent_kafka_vector_search_prompt_inference_spark.sources.registry import (
    SchemaRegistry,
    decode_json_topic,
)

# the reference's user_questions data contract, README.md:228-252
QUESTIONS_CONTRACT = """
{
  "type": "object",
  "properties": {
    "role": {"type": "string"},
    "content": {"type": "string"},
    "sessionid": {"type": "string"},
    "email": {"type": "string"}
  },
  "additionalProperties": false
}
"""

KAFKA_CONNECTOR_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset bigint, "
    "timestamp timestamp, timestampType int"
)


def json_sr_frame(payload: dict, schema_id: int) -> bytes:
    """Confluent JSON-Schema serializer wire format: 0x00 + int32 id + JSON."""
    return struct.pack(">bI", 0, schema_id) + json.dumps(payload).encode("utf-8")


def _wire_rows():
    """Three records as the connector would deliver them: two JSON_SR-framed
    (different producers / schema ids), one bare-JSON console-producer row."""
    t0 = datetime.datetime(2024, 5, 1, 12, 0, 0)
    return [
        (
            b"8888",  # the reference's example message key, README.md:187
            json_sr_frame(
                {"role": "user", "content": "mens formal shoes medium",
                 "sessionid": "abc123", "email": "u@example.com"},
                schema_id=100001,
            ),
            "user_questions", 0, 0, t0, 0,
        ),
        (
            b"8889",
            json_sr_frame(
                {"role": "user", "content": "little girls medium shoes",
                 "sessionid": "abc124", "email": "v@example.com"},
                schema_id=100002,
            ),
            "user_questions", 0, 1, t0 + datetime.timedelta(seconds=30), 0,
        ),
        (
            None,  # console producer: no key, bare JSON value
            json.dumps(
                {"role": "user", "content": "wide toddler sneakers",
                 "sessionid": "abc125", "email": "w@example.com"}
            ).encode("utf-8"),
            "user_questions", 0, 2, t0 + datetime.timedelta(seconds=60), 0,
        ),
    ]


@pytest.fixture()
def wire(spark):
    return spark.createDataFrame(_wire_rows(), KAFKA_CONNECTOR_SCHEMA)


def test_wire_bytes_decode_end_to_end(spark, wire):
    reg = SchemaRegistry()
    reg.register("user_questions", QUESTIONS_CONTRACT)
    out = decode_json_topic(wire, reg, "user_questions").orderBy("sessionid")
    rows = out.collect()
    assert [r.content for r in rows] == [
        "mens formal shoes medium",
        "little girls medium shoes",
        "wide toddler sneakers",
    ]
    # framed and unframed records decode identically; key bytes preserved
    assert rows[0].key == b"8888" and rows[2].key is None
    assert all(r.role == "user" for r in rows)


def test_wire_bytes_without_contract_unreadable(spark, wire):
    reg = SchemaRegistry()
    with pytest.raises(KeyError, match="no data contract"):
        decode_json_topic(wire, reg, "user_questions")  # README.md:221-223


def test_framing_detection_is_per_record(spark):
    """A bare-JSON record whose first byte is '{' (0x7b) must NOT be
    mistaken for framing, and a framed record whose embedded JSON contains
    0x00-looking text is still stripped correctly."""
    reg = SchemaRegistry()
    reg.register("t", '{"type":"object","properties":{"a":{"type":"string"}}}')
    rows = [
        (None, json.dumps({"a": "plain"}).encode()),
        (None, json_sr_frame({"a": "framed"}, schema_id=7)),
    ]
    df = spark.createDataFrame(rows, "key binary, value binary")
    got = sorted(r.a for r in decode_json_topic(df, reg, "t").collect())
    assert got == ["framed", "plain"]


def test_old_payloads_under_evolved_contract(spark, wire):
    """Contract evolution (README.md:610-612): after adding a field, already
    -recorded wire bytes decode with the new field NULL — the topic
    "automatically updates" without rewriting history."""
    reg = SchemaRegistry()
    reg.register("user_questions", QUESTIONS_CONTRACT)
    reg.evolve(
        "user_questions",
        json.dumps(
            {
                "type": "object",
                "properties": {
                    "role": {"type": "string"},
                    "content": {"type": "string"},
                    "sessionid": {"type": "string"},
                    "email": {"type": "string"},
                    "priority": {"type": "integer"},
                },
            }
        ),
    )
    out = decode_json_topic(wire, reg, "user_questions")
    assert "priority" in out.columns
    assert all(r.priority is None for r in out.collect())
    # and a new-style payload carrying the field decodes it
    new_wire = spark.createDataFrame(
        [(None, json_sr_frame({"role": "user", "content": "x", "sessionid": "s",
                               "email": "e", "priority": 3}, schema_id=100003))],
        "key binary, value binary",
    )
    assert decode_json_topic(new_wire, reg, "user_questions").first().priority == 3


def test_corrupt_payload_decodes_null_not_crash(spark):
    """PERMISSIVE from_json semantics: junk bytes → NULL columns, the scan
    survives — a poison-pill message must not kill a streaming pipeline."""
    reg = SchemaRegistry()
    reg.register("t", '{"type":"object","properties":{"a":{"type":"string"}}}')
    df = spark.createDataFrame(
        [(None, b"\xde\xad\xbe\xef"), (None, b"not json at all")],
        "key binary, value binary",
    )
    rows = decode_json_topic(df, reg, "t").collect()
    assert len(rows) == 2 and all(r.a is None for r in rows)


def test_encode_decode_roundtrip(spark):
    """Producer-side framing: encode_json_topic writes the exact JSON_SR
    frame decode_json_topic consumes — full typed → wire → typed
    round trip, header byte-checked."""
    from confluent_kafka_vector_search_prompt_inference_spark.sources.registry import (
        SchemaRegistry,
        decode_json_topic,
        encode_json_topic,
    )

    reg = SchemaRegistry()
    reg.register(
        "orders_out",
        {
            "type": "object",
            "properties": {
                "order_id": {"type": "integer"},
                "item": {"type": "string"},
                "qty": {"type": "integer"},
            },
        },
    )
    from pyspark.sql import functions as F

    rows = [(1, "widget", 3), (2, "gadget", 5)]
    df = spark.createDataFrame(rows, "order_id long, item string, qty long").withColumn(
        "k", F.col("order_id").cast("string")
    )
    wire = encode_json_topic(df, reg, "orders_out", key_col="k")
    frames = wire.collect()
    sid = reg.version("orders_out")
    for r in frames:
        assert r.value[0] == 0
        assert int.from_bytes(r.value[1:5], "big") == sid
        assert r.value[5:6] == b"{"  # compact JSON payload
    decoded = decode_json_topic(wire, reg, "orders_out")
    got = {(r.order_id, r.item, r.qty) for r in decoded.collect()}
    assert got == set(rows)


def test_encode_rejects_missing_contract_columns(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.sources.registry import (
        SchemaRegistry,
        encode_json_topic,
    )

    reg = SchemaRegistry()
    reg.register(
        "t_out",
        {"type": "object", "properties": {"a": {"type": "integer"}, "b": {"type": "string"}}},
    )
    df = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(ValueError, match="missing contract columns"):
        encode_json_topic(df, reg, "t_out")
