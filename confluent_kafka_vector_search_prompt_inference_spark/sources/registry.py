"""Schema-registry shim: late-bound JSON data contracts for topics.

Reference flow (``README.md:221-252``): a schemaless topic is unreadable
bytes until a JSON-schema data contract is attached; after that the same
scan decodes typed columns — schema is attached to the *topic*, applied at
read. The shim keeps a name→StructType mapping and decodes Kafka-shaped
DataFrames (``key BINARY, value BINARY``) with ``from_json`` — the decode is
a Catalyst expression, so at scale it fuses into the scan stage with no
extra pass. Schema evolution = re-register; next read uses the new contract
(``README.md:610-612``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DataType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def json_schema_to_struct(schema: dict | str) -> StructType:
    """Convert a draft-07 JSON schema (the reference's contract format,
    ``README.md:228-252, 517``) into a Spark StructType.

    Unsupported/underspecified ``object`` (no properties) is rejected — the
    reference's ``ROW<>`` pitfall (``README.md:552-594``): JSON objects you
    don't type fully must be carried as STRING."""
    if isinstance(schema, str):
        schema = json.loads(schema)

    def convert(node: dict, path: str) -> DataType:
        t = node.get("type")
        if t == "string":
            return StringType()
        if t == "integer":
            return LongType()
        if t == "number":
            return DoubleType()
        if t == "array":
            return ArrayType(convert(node.get("items", {}), path + "[]"))
        if t == "object":
            props = node.get("properties")
            if not props:
                raise ValueError(
                    f"JSON schema at {path or '$'} is an untyped object (would be "
                    "ROW<> — reference README.md:552-594); declare properties or "
                    "carry it as a string"
                )
            return StructType(
                [StructField(k, convert(v, f"{path}.{k}")) for k, v in props.items()]
            )
        raise ValueError(f"Unsupported JSON-schema type {t!r} at {path or '$'}")

    out = convert(schema, "")
    if not isinstance(out, StructType):
        raise ValueError("Top-level data contract must be an object")
    return out


@dataclass
class SchemaRegistry:
    """topic name → versioned data contracts; latest wins at read time."""

    contracts: dict[str, list[StructType]] = field(default_factory=dict)

    def register(self, topic: str, schema: StructType | dict | str) -> int:
        if not isinstance(schema, StructType):
            schema = json_schema_to_struct(schema)
        versions = self.contracts.setdefault(topic, [])
        versions.append(schema)
        return len(versions)

    def latest(self, topic: str) -> StructType:
        if topic not in self.contracts or not self.contracts[topic]:
            raise KeyError(
                f"Topic '{topic}' has no data contract — raw bytes are unreadable "
                "(reference README.md:221-223)"
            )
        return self.contracts[topic][-1]

    def version(self, topic: str) -> int:
        """Current contract version (1-based; 0 = no contract)."""
        return len(self.contracts.get(topic, []))

    def evolve(self, topic: str, schema: StructType | dict | str) -> int:
        """Register a new contract version, enforcing backward compatibility:
        every existing field keeps its exact type; new fields may be added
        (they decode as NULL from old payloads — the reference's "table
        will automatically update" flow, ``README.md:610-612``). Breaking
        changes (drop / retype) raise ``ValueError`` — that is a new topic,
        not an evolution."""
        if not isinstance(schema, StructType):
            schema = json_schema_to_struct(schema)
        current = self.latest(topic)
        cur = {f.name: f.dataType for f in current.fields}
        new = {f.name: f.dataType for f in schema.fields}
        missing = set(cur) - set(new)
        if missing:
            raise ValueError(
                f"Contract evolution for '{topic}' drops fields {sorted(missing)}; "
                "evolution may only add fields"
            )
        for name, typ in cur.items():
            if new[name] != typ:
                raise ValueError(
                    f"Contract evolution for '{topic}' changes type of '{name}': "
                    f"{typ.simpleString()} -> {new[name].simpleString()}; "
                    "evolution may only add fields"
                )
        return self.register(topic, schema)


def decode_json_topic(df: DataFrame, registry: SchemaRegistry, topic: str) -> DataFrame:
    """Kafka-shaped frame (``key, value`` binary) → typed columns.

    ``from_json(cast(value as string), contract)`` then flatten — exactly the
    reference's "attach contract, topic becomes readable" transition
    (``README.md:225-257``). Key is kept as ``key`` (``README.md:551``).

    Handles BOTH value framings the reference's ``'value.format'=
    'json-registry'`` (``README.md:272``) implies on the wire:

    - Confluent Schema-Registry JSON_SR framing — magic byte ``0x00`` +
      4-byte big-endian schema id + JSON UTF-8 (the producer-side wire
      format of Confluent's JSON-Schema serializer); the 5-byte header is
      stripped before parsing.
    - bare JSON UTF-8 bytes (console producers, ``to_kafka_shape``).

    Detection is per-record and exact: JSON text can never start with
    ``0x00`` (it opens with ``{``/``[``/quote/digit/whitespace), so the
    magic byte is unambiguous. Pure Catalyst (``substring`` on binary +
    ``from_json``) — fuses into the scan, no UDF."""
    schema = registry.latest(topic)
    framed = F.substring(F.col("value"), 1, 1) == F.lit(b"\x00")
    payload = F.when(
        framed, F.expr("substring(value, 6, length(value) - 5)")
    ).otherwise(F.col("value"))
    parsed = df.withColumn("__data", F.from_json(payload.cast("string"), schema))
    keep = ["key"] if "key" in df.columns else []
    return parsed.select(*keep, "__data.*")


def encode_json_topic(
    df: DataFrame,
    registry: SchemaRegistry,
    topic: str,
    *,
    key_col: str | None = None,
) -> DataFrame:
    """Typed columns → Kafka-shaped frame: the PRODUCER side of the wire
    contract :func:`decode_json_topic` consumes (Confluent JSON_SR
    framing: magic ``0x00`` + 4-byte big-endian schema id + compact JSON
    UTF-8). The registry's current version for the topic stamps the
    header, so consumers resolve the exact contract each record was
    written under. Pure Catalyst: the 5-byte header is a binary literal,
    the payload is ``to_json`` over the contract's columns — fuses into
    the producing stage, no UDF, streaming-safe (use with
    ``writeStream.format('kafka')`` by aliasing to ``key``/``value``).

    Output: ``key BINARY`` (if ``key_col``) and ``value BINARY``; columns
    beyond the registered contract are rejected rather than silently
    dropped."""
    schema = registry.latest(topic)
    schema_id = registry.version(topic)
    contract_cols = [f.name for f in schema.fields]
    missing = [c for c in contract_cols if c not in df.columns]
    if missing:
        raise ValueError(f"encode_json_topic: missing contract columns {missing}")
    header = F.lit(b"\x00" + int(schema_id).to_bytes(4, "big"))
    value = F.concat(
        header,
        F.to_json(F.struct(*[F.col(c) for c in contract_cols])).cast("binary"),
    )
    out = [value.alias("value")]
    if key_col is not None:
        out.insert(0, F.col(key_col).cast("string").cast("binary").alias("key"))
    return df.select(*out)
