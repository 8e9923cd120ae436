"""Sources & sinks: Kafka topics, schema-registry decode, files, multimodal.

The reference's datasets are Kafka topics with late-bound schema-registry
contracts (``README.md:101-105, 223-252``) plus one external MongoDB
collection (``README.md:334-346``). Here: Kafka via Spark's kafka source
(option builders below; no broker in CI, so construction is config-only),
files via Parquet/JSON/CSV, the vector corpus as a plain Parquet table, and
multimodal blobs via ``binaryFile``.
"""

from confluent_kafka_vector_search_prompt_inference_spark.sources.registry import SchemaRegistry, decode_json_topic
from confluent_kafka_vector_search_prompt_inference_spark.sources.kafka import kafka_reader, kafka_stream_reader
from confluent_kafka_vector_search_prompt_inference_spark.sources.multimodal import (
    MULTIMODAL_SCHEMA,
    decode_audio,
    decode_image,
    read_binary_dir,
    resize_image,
    with_image_features,
)

__all__ = [
    "SchemaRegistry",
    "decode_json_topic",
    "kafka_reader",
    "kafka_stream_reader",
    "MULTIMODAL_SCHEMA",
    "read_binary_dir",
    "decode_image",
    "decode_audio",
    "resize_image",
    "with_image_features",
]
