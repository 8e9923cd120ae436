"""PySpark-native analytics engine with the query and data-processing
capabilities of ``brittonlaroche/Confluent-Kafka-Vector-Search-Prompt-Inference``.

The reference (surveyed in SURVEY.md) is a continuously-running RAG
pipeline expressed as Confluent Flink SQL: Kafka topic scans, model
inference via ``ML_PREDICT``, top-k dot-product vector search via
``FEDERATED_SEARCH``, lateral joins, JSON prompt assembly, and
continuous INSERT-SELECT sinks (reference ``README.md:19-24``).

This package re-expresses that surface Spark-first:

- ``session``    — tuned SparkSession bootstrap (AQE, Arrow, 32 shuffle parts)
- ``catalog``    — table registry over Parquet dirs + late-bound schema shim
- ``functions``  — vector / JSON / text column functions (JVM-side built-ins)
- ``operators``  — top-k similarity join, dedup family, ANN/IVF indexes,
  BM25 + hybrid retrieval, sequence packing, sampling, outlier scoring
- ``models``     — CREATE MODEL registry, versioning, batched inference UDFs
- ``sources``    — Kafka / file / schema-registry-decoded sources, multimodal
- ``streaming``  — continuous pipelines (foreachBatch, watermarks, windows)
- ``plans``      — plan inspection helpers (pushdown / broadcast assertions)
- ``sqlshim``    — ML_PREDICT / FEDERATED_SEARCH / CREATE MODEL SQL dialect
"""

from confluent_kafka_vector_search_prompt_inference_spark.session import get_spark, stop_spark
from confluent_kafka_vector_search_prompt_inference_spark.catalog import Catalog

__all__ = ["get_spark", "stop_spark", "Catalog"]

__version__ = "0.1.0"
