"""Streaming: continuous pipelines with exactly-once file sinks.

The reference's pipelines are unbounded ``INSERT INTO ... SELECT`` Flink
jobs ("will run forever in the background", ``README.md:435``). Spark-first
equivalent: Structured Streaming micro-batches with ``foreachBatch`` and
batch-id-keyed idempotent writes (SURVEY.md §4.3).
"""

from confluent_kafka_vector_search_prompt_inference_spark.streaming.pipeline import (
    continuous_insert,
    file_stream_reader,
    idempotent_batch_writer,
)
from confluent_kafka_vector_search_prompt_inference_spark.streaming.rag import RagPipeline

__all__ = [
    "continuous_insert",
    "file_stream_reader",
    "idempotent_batch_writer",
    "RagPipeline",
]
