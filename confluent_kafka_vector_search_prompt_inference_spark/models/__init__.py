"""Model registry: named, versioned inference endpoints as catalog objects.

Reference semantics (SURVEY.md §2.10):

- ``CREATE MODEL name INPUT(...) OUTPUT(...) WITH (options)`` declares a
  typed model (embedding ``README.md:205-213``, LLM ``README.md:469-480``);
- models are versioned; the **first created version is the default**
  (``README.md:718``), changeable via ``ALTER MODEL ... SET
  ('default_version'=...)`` (``README.md:712-714``);
- call sites may pin ``model$4`` or enumerate ``model$all``
  (``README.md:661-704``);
- ``DESCRIBE MODEL [$all]`` introspects versions/signatures/options
  (``README.md:660-699``);
- ``ML_PREDICT(model, expr)`` applies the model laterally, appending its
  output column(s) per input row (``README.md:280, 287, 629, 726-731``).

Spark-first compilation: ``ML_PREDICT`` is **not** a join — it compiles to
an Arrow-batched pandas UDF (``withColumn``), amortizing the provider call
over whole batches. Live providers are marked nondeterministic so Catalyst
never duplicates paid calls (SURVEY.md §4.2).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StringType, DataType

from confluent_kafka_vector_search_prompt_inference_spark.models.providers import (
    HashingEmbedder,
    HttpChatProvider,
    Provider,
    TemplateLLM,
    parse_embedding_response,
)

__all__ = [
    "ModelRegistry",
    "ModelVersion",
    "ModelNotFound",
    "Provider",
    "HashingEmbedder",
    "TemplateLLM",
    "HttpChatProvider",
    "parse_embedding_response",
]

_VERSION_RE = re.compile(r"^(?P<name>[A-Za-z_][\w.-]*)(?:\$(?P<ver>all|\d+))?$")


class ModelNotFound(KeyError):
    """Reference analog: querying a non-existent model version 404s
    (``README.md:657``)."""


@dataclass
class ModelVersion:
    version: int
    task: str  # 'embedding' | 'text_generation'
    provider: Provider
    input_type: DataType = field(default_factory=StringType)
    output_type: DataType = None  # type: ignore[assignment]
    output_col: str = ""
    options: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.output_type is None:
            self.output_type = (
                ArrayType(FloatType()) if self.task == "embedding" else StringType()
            )
        if not self.output_col:
            self.output_col = "vector" if self.task == "embedding" else "json_response"


@dataclass
class ModelRegistry:
    """name → {version → ModelVersion} with reference default-version rules."""

    models: dict[str, dict[int, ModelVersion]] = field(default_factory=dict)
    defaults: dict[str, int] = field(default_factory=dict)

    def create_model(
        self,
        name: str,
        task: str,
        provider: Provider,
        *,
        output_col: str = "",
        options: dict[str, str] | None = None,
    ) -> ModelVersion:
        versions = self.models.setdefault(name, {})
        version = max(versions, default=0) + 1
        mv = ModelVersion(
            version=version,
            task=task,
            provider=provider,
            output_col=output_col,
            options=dict(options or {}),
        )
        versions[version] = mv
        # first created version is the default (README.md:718)
        self.defaults.setdefault(name, version)
        return mv

    def alter_default(self, name: str, version: int) -> None:
        """``ALTER MODEL name SET ('default_version'='v')``
        (``README.md:712-714``)."""
        if version not in self.models.get(name, {}):
            raise ModelNotFound(f"Model '{name}' version {version} not found")
        self.defaults[name] = version

    def get(self, ref: str) -> ModelVersion:
        """Resolve ``name``, ``name$4`` (``README.md:704-708``)."""
        m = _VERSION_RE.match(ref)
        if not m or m.group("ver") == "all":
            raise ModelNotFound(f"Bad model reference {ref!r}")
        name = m.group("name")
        if name not in self.models:
            raise ModelNotFound(f"Model '{name}' not found")
        ver = int(m.group("ver")) if m.group("ver") else self.defaults[name]
        if ver not in self.models[name]:
            raise ModelNotFound(f"Model '{name}' version {ver} not found")
        return self.models[name][ver]

    def describe(self, spark: SparkSession, ref: str) -> DataFrame:
        """``DESCRIBE MODEL name`` / ``DESCRIBE MODEL name$all``
        (``README.md:660-699``) as a DataFrame."""
        m = _VERSION_RE.match(ref)
        if not m or m.group("name") not in self.models:
            raise ModelNotFound(f"Model {ref!r} not found")
        name = m.group("name")
        if m.group("ver") == "all":
            versions = sorted(self.models[name])
        elif m.group("ver"):
            versions = [int(m.group("ver"))]
        else:
            versions = [self.defaults[name]]
        rows = []
        for v in versions:
            mv = self.models[name].get(v)
            if mv is None:
                raise ModelNotFound(f"Model '{name}' version {v} not found")
            rows.append(
                (
                    name,
                    mv.version,
                    mv.version == self.defaults[name],
                    mv.task,
                    f"({mv.input_type.simpleString()}) -> "
                    f"({mv.output_col} {mv.output_type.simpleString()})",
                    sorted(mv.options.items()),
                )
            )
        return spark.createDataFrame(
            rows, "name string, version int, is_default boolean, task string, "
            "signature string, options array<struct<_1:string,_2:string>>"
        )

    # -- compilation ------------------------------------------------------

    def predict_column(self, ref: str) -> "callable":
        """Compile ``ML_PREDICT(ref, col)`` into a column function.

        Returns ``fn(col) -> Column`` backed by an Arrow-batched pandas UDF;
        nondeterministic providers are marked so Catalyst won't re-execute
        or common-subexpression-duplicate the call."""
        mv = self.get(ref)
        provider = mv.provider
        if mv.task == "embedding":

            def batch(s: pd.Series) -> pd.Series:
                return pd.Series(provider.embed_batch(s.fillna("").tolist()))

        else:

            def batch(s: pd.Series) -> pd.Series:
                return pd.Series(provider.complete_batch(s.fillna("").tolist()))

        udf = F.pandas_udf(batch, mv.output_type)
        if not provider.deterministic:
            udf = udf.asNondeterministic()
        return udf

    def ml_predict(self, df: DataFrame, ref: str, input_col: Column | str) -> DataFrame:
        """The reference's lateral-join call shape: one row in → same row out
        with the model's output column appended (``README.md:286-288``)."""
        mv = self.get(ref)
        col = F.col(input_col) if isinstance(input_col, str) else input_col
        return df.withColumn(mv.output_col, self.predict_column(ref)(col))
