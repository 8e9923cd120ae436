"""Column-function surface: vector math, JSON, text analysis.

Everything here is built from ``pyspark.sql.functions`` primitives (JVM-side,
whole-stage-codegen-friendly); Python only composes expressions. The slow
path (Pandas UDFs) lives in ``operators/`` where it is genuinely needed.
"""

from confluent_kafka_vector_search_prompt_inference_spark.functions.vector import (
    vec_dot,
    vec_cosine,
    vec_l2norm,
    vec_normalize,
    vec_l2_distance,
)
from confluent_kafka_vector_search_prompt_inference_spark.functions.json_fns import json_object
from confluent_kafka_vector_search_prompt_inference_spark.functions.text import (
    token_count,
    word_tokens,
    punct_ratio,
    stopword_ratio,
    quality_score,
    language_id,
    doc_fingerprint,
    normalized_text,
)

__all__ = [
    "vec_dot",
    "vec_cosine",
    "vec_l2norm",
    "vec_normalize",
    "vec_l2_distance",
    "json_object",
    "token_count",
    "word_tokens",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "language_id",
    "doc_fingerprint",
    "normalized_text",
]
