"""SQL dialect shim: the reference's Flink-SQL statement forms on Spark.

Statement forms supported (exactly the shapes the reference exercises —
SURVEY.md §2.10, §6 M5):

- ``CREATE MODEL name INPUT(...) OUTPUT(...) WITH ('task'=..., ...)``
  (``README.md:205-213, 469-480``)
- ``ALTER MODEL name SET ('default_version'='N')`` (``README.md:712-714``)
- ``DESCRIBE MODEL name`` / ``DESCRIBE MODEL name$all`` (``README.md:660-699``)
- ``SELECT ... FROM t, LATERAL TABLE(ML_PREDICT('model[$v]', col))``
  (``README.md:279-281, 628-632``)
- ``SELECT ... FROM t, LATERAL TABLE(FEDERATED_SEARCH('corpus', k, col))``
  (``README.md:403-407``)
- ``INSERT INTO sink SELECT ...`` — runs the SELECT (including lateral
  rewrites) and appends through the analysis-time sink schema check
  (``README.md:286-288, 438-446``; mismatch error ``README.md:586-594``)
- ``JSON_OBJECT('k' VALUE v, ...)`` → ``to_json(struct(...))`` — preserving
  the string-return semantic (``README.md:598``)
- ``ARRAY[ROW(...), ...]`` literals in INSERT VALUES (``README.md:616-623``)

Everything else passes through to ``spark.sql`` untouched, so the full
Spark SQL surface remains available. The rewrites are source-to-source: the
lateral-table clause is replaced by a temp view (aliased to the original
table name so qualified projections keep resolving), computed with the
engine's DataFrame operators — Catalyst then optimizes the whole statement
as one plan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.catalog import Catalog
from confluent_kafka_vector_search_prompt_inference_spark.models import (
    HashingEmbedder,
    ModelRegistry,
    TemplateLLM,
)
from confluent_kafka_vector_search_prompt_inference_spark.operators.topk_join import topk_similarity_join

_CREATE_MODEL = re.compile(
    r"^\s*CREATE\s+MODEL\s+`?(?P<name>\w+)`?\s*"
    r"INPUT\s*\((?P<input>[^)]*)\)\s*"
    r"OUTPUT\s*\((?P<output>[^)]*)\)\s*"
    r"WITH\s*\((?P<options>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_MODEL = re.compile(
    r"^\s*ALTER\s+MODEL\s+`?(?P<name>\w+)`?\s+SET\s*\((?P<options>.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DESCRIBE_MODEL = re.compile(
    r"^\s*DESCRIBE\s+MODEL\s+`?(?P<ref>\w+(?:\$(?:all|\d+))?)`?\s*;?\s*$", re.IGNORECASE
)
_CREATE_TABLE = re.compile(
    r"^\s*CREATE\s+TABLE\s+`?(?P<name>\w+)`?\s*\((?P<cols>.*?)\)\s*"
    r"(?:WITH\s*\((?P<options>.*)\))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_SELECT = re.compile(
    r"^\s*INSERT\s+INTO\s+`?(?P<sink>\w+)`?\s*(?P<select>SELECT\s+.*)$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_VALUES = re.compile(
    r"^\s*INSERT\s+INTO\s+`?(?P<sink>\w+)`?\s*VALUES\s*(?P<values>\(.*\))\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_LATERAL_ML_PREDICT = re.compile(
    r"FROM\s+`?(?P<table>\w+)`?\s*,\s*LATERAL\s+TABLE\s*\(\s*ML_PREDICT\s*\(\s*"
    r"'(?P<model>[\w$]+)'\s*,\s*`?(?P<col>\w+)`?\s*\)\s*\)",
    re.IGNORECASE,
)
_LATERAL_FED_SEARCH = re.compile(
    r"FROM\s+`?(?P<table>\w+)`?\s*,\s*LATERAL\s+TABLE\s*\(\s*FEDERATED_SEARCH\s*\(\s*"
    r"'(?P<corpus>\w+)'\s*,\s*(?P<k>\d+)\s*,\s*`?(?P<col>\w+)`?\s*\)\s*\)",
    re.IGNORECASE,
)
_LATERAL_TEXT_SEARCH = re.compile(
    r"FROM\s+`?(?P<table>\w+)`?\s*,\s*LATERAL\s+TABLE\s*\(\s*TEXT_SEARCH\s*\(\s*"
    r"'(?P<corpus>\w+)'\s*,\s*(?P<k>\d+)\s*,\s*`?(?P<col>\w+)`?\s*\)\s*\)",
    re.IGNORECASE,
)
_JSON_OBJECT_PAIR = re.compile(r"'(?P<key>[^']+)'\s+VALUE\s+", re.IGNORECASE)
_OPTION_PAIR = re.compile(r"'(?P<k>[^']*)'\s*=\s*'(?P<v>[^']*)'")


def _parse_options(blob: str) -> dict[str, str]:
    return {m.group("k"): m.group("v") for m in _OPTION_PAIR.finditer(blob)}


def _translate_constructors(values: str) -> str:
    """Flink → Spark literal constructors in a VALUES clause:
    ``ARRAY[...]`` → ``array(...)`` and ``ROW(...)`` → ``struct(...)``.

    Single quote-aware scan: brackets and keywords inside string literals
    (``'size [large]'``, ``'it''s ROW(ish)'``) are left untouched, and each
    ``]`` is rewritten to ``)`` only when it closes a matching ``ARRAY[``."""
    out: list[str] = []
    stack: list[bool] = []  # True = bracket opened by ARRAY[
    i, n = 0, len(values)
    while i < n:
        c = values[i]
        if c == "'":  # string literal: copy through, honoring '' escapes
            j = i + 1
            while j < n:
                if values[j] == "'":
                    if j + 1 < n and values[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            out.append(values[i : j + 1])
            i = j + 1
            continue
        at_word_start = i == 0 or not (values[i - 1].isalnum() or values[i - 1] == "_")
        if at_word_start:
            m = re.match(r"ARRAY\s*\[", values[i:], re.IGNORECASE)
            if m:
                out.append("array(")
                stack.append(True)
                i += m.end()
                continue
            m = re.match(r"ROW\s*\(", values[i:], re.IGNORECASE)
            if m:
                out.append("struct(")
                i += m.end()
                continue
        if c == "[":
            stack.append(False)
            out.append(c)
        elif c == "]":
            out.append(")" if (stack.pop() if stack else False) else c)
        else:
            out.append(c)
        i += 1
    return "".join(out)


class ConnectionNotFound(KeyError):
    """Reference analog: a model/table referencing an unknown connection
    fails at statement submission — "Connection 'mongodb-connection' not
    found" (``README.md:312-316``)."""


@dataclass
class EngineSession:
    """``engine.sql(...)`` — the reference's statement surface on Spark."""

    spark: SparkSession
    catalog: Catalog
    registry: ModelRegistry = field(default_factory=ModelRegistry)
    connections: dict[str, dict[str, str]] = field(default_factory=dict)
    _view_counter: int = 0

    def create_connection(self, name: str, **options: str) -> None:
        """Named credential/endpoint bundle, environment-scoped
        (``README.md:52-96``). Secrets never enter any DataFrame."""
        self.connections[name] = dict(options)

    def sql(self, statement: str) -> DataFrame | None:
        if m := _CREATE_MODEL.match(statement):
            return self._create_model(m)
        if m := _ALTER_MODEL.match(statement):
            opts = _parse_options(m.group("options"))
            if "default_version" in opts:
                self.registry.alter_default(m.group("name"), int(opts["default_version"]))
            return None
        if m := _DESCRIBE_MODEL.match(statement):
            return self.registry.describe(self.spark, m.group("ref"))
        if m := _CREATE_TABLE.match(statement):
            return self._create_table(m)
        if m := _INSERT_VALUES.match(statement):
            return self._insert_values(m)
        if m := _INSERT_SELECT.match(statement):
            df = self.sql(m.group("select"))
            assert df is not None
            self.catalog.insert_into(m.group("sink"), df)
            return None
        if statement.strip().upper() == "SHOW MODELS":
            # one row per registered model (the statement-surface pair of
            # DESCRIBE MODEL; mirrors the reference UI's model listing)
            rows = [
                (
                    name,
                    versions[self.registry.defaults[name]].task,
                    len(versions),
                    self.registry.defaults[name],
                )
                for name, versions in sorted(self.registry.models.items())
            ]
            return self.spark.createDataFrame(
                rows, "name string, task string, versions int, default_version int"
            )
        if m := re.match(r"(?is)^\s*EXPLAIN\s+(?P<body>.+)$", statement):
            # rewrite laterals exactly as the real execution path would,
            # then surface Spark's formatted physical plan as a row — the
            # operator a reference user reaches for before running a new
            # continuous statement against a 100 TB topic
            from confluent_kafka_vector_search_prompt_inference_spark.plans import formatted_plan

            df = self.sql(m.group("body"))
            assert df is not None
            return self.spark.createDataFrame([(formatted_plan(df),)], "plan string")
        return self.spark.sql(self._rewrite_query(statement))

    # -- statement handlers -------------------------------------------------

    def _create_model(self, m: re.Match) -> None:
        opts = _parse_options(m.group("options"))
        # connection references resolve at statement time (README.md:312-316)
        for key, value in opts.items():
            if key.endswith(".connection") or key == "connection":
                if value not in self.connections:
                    raise ConnectionNotFound(f"Connection '{value}' not found")
        task = opts.get("task", "embedding").lower().replace("-", "_")
        task = "embedding" if "embed" in task else "text_generation"
        # Local deterministic providers by default; live providers are
        # drop-ins registered under the same names.
        if task == "embedding":
            provider = HashingEmbedder(dim=int(opts.get("dim", "64")))
        else:
            provider = TemplateLLM(
                system_prompt=opts.get(
                    "openai.system_prompt", opts.get("system_prompt", "assistant")
                )
            )
        out = m.group("output").strip()
        output_col = out.split()[0].strip("`") if out else ""
        self.registry.create_model(m.group("name"), task, provider, output_col=output_col, options=opts)
        return None

    def _create_table(self, m: re.Match) -> None:
        """``CREATE TABLE name (cols) WITH (...)`` — the reference's sink
        declaration (``README.md:266-274, 413-421``): auto-creates the
        backing store + registers the schema ("creates the topic and the
        data contract", ``README.md:275``). Flink types are mapped to Spark
        DDL; the WITH options (``value.format`` etc.) are recorded but the
        wire format here is always Parquet."""
        cols = m.group("cols").strip()
        # Flink → Spark DDL: ROW<...> → STRUCT<...>; BYTES → BINARY
        ddl = re.sub(r"\bROW\s*<", "STRUCT<", cols, flags=re.IGNORECASE)
        ddl = re.sub(r"\bBYTES\b", "BINARY", ddl, flags=re.IGNORECASE)
        if re.search(r"STRUCT<\s*>", ddl):
            raise ValueError(
                "untyped ROW<> column in CREATE TABLE — declare the full struct "
                "or use STRING + json_object (reference README.md:552-594)"
            )
        schema = __import__("pyspark.sql.types", fromlist=["_parse_datatype_string"])
        struct = schema._parse_datatype_string(f"struct<{ddl}>")
        import os
        import tempfile

        base = self.spark.conf.get("spark.sql.warehouse.dir", tempfile.gettempdir())
        path = os.path.join(base.removeprefix("file:"), f"engine_table_{m.group('name')}")
        empty = self.spark.createDataFrame([], struct)
        empty.write.mode("overwrite").parquet(path)
        self.catalog.add_table(m.group("name"), path, schema=struct)
        self.catalog.table(m.group("name")).createOrReplaceTempView(m.group("name"))
        return None

    def _insert_values(self, m: re.Match) -> None:
        """Literal inserts incl. nested ``ARRAY[ROW(...)]`` constructors
        (``README.md:616-623``): translate Flink constructors to Spark
        (``ARRAY[...]``→``array(...)``, ``ROW(...)``→``struct(...)``), build
        rows with SELECT-VALUES, cast positionally to the sink schema."""
        sink = m.group("sink")
        values = _translate_constructors(m.group("values"))
        target = self.catalog.schema(sink)
        names = [f.name for f in target.fields]
        df = self.spark.sql(f"SELECT * FROM VALUES {values}")
        casted = df.select(
            *[
                F.col(old).cast(fld.dataType).alias(fld.name)
                for old, fld in zip(df.columns, target.fields)
            ]
        )
        self.catalog.insert_into(sink, casted.select(*names))
        return None

    # -- query rewriting ------------------------------------------------------

    def _fresh_view(self, df: DataFrame, alias: str) -> str:
        self._view_counter += 1
        name = f"__engine_lateral_{self._view_counter}"
        df.createOrReplaceTempView(name)
        return f"FROM {name} AS {alias}"

    def _rewrite_query(self, statement: str) -> str:
        statement = self._rewrite_json_object(statement)
        while m := _LATERAL_ML_PREDICT.search(statement):
            base = self.catalog.table(m.group("table"))
            predicted = self.registry.ml_predict(base, m.group("model"), m.group("col"))
            statement = statement[: m.start()] + self._fresh_view(
                predicted, m.group("table")
            ) + statement[m.end() :]
        while m := _LATERAL_FED_SEARCH.search(statement):
            statement = statement[: m.start()] + self._fresh_view(
                self._federated_search(m.group("table"), m.group("corpus"), int(m.group("k")), m.group("col")),
                m.group("table"),
            ) + statement[m.end() :]
        while m := _LATERAL_TEXT_SEARCH.search(statement):
            statement = statement[: m.start()] + self._fresh_view(
                self._text_search(m.group("table"), m.group("corpus"), int(m.group("k")), m.group("col")),
                m.group("table"),
            ) + statement[m.end() :]
        return statement

    def _federated_search(self, table: str, corpus_name: str, k: int, vec_col: str) -> DataFrame:
        """``FEDERATED_SEARCH(corpus, k, vector)``: append ``search_results
        ARRAY<STRUCT<content>>`` — top-k corpus rows by the corpus table's
        registered index metric (``README.md:403-407``; index options
        ``README.md:355-366``, metric ``README.md:380``)."""
        idx = self.catalog.vector_index(corpus_name)
        queries = self.catalog.table(table).withColumn(
            "__qid", F.md5(F.to_json(F.struct("*")))
        )
        corpus = self.catalog.table(corpus_name)
        hits = topk_similarity_join(
            queries, corpus, k,
            query_id="__qid", query_vec=vec_col,
            corpus_id=idx.id_column, corpus_vec=idx.column,
            metric=idx.metric,
            # a declared recall floor supersedes the guessed candidate
            # count — passing both would pin the depth and skip calibration
            num_candidates=(
                None if idx.recall_target is not None else idx.num_candidates
            ),
            recall_target=idx.recall_target,
        )
        packed = (
            hits.join(F.broadcast(corpus.select(idx.id_column, "content")), idx.id_column)
            .groupBy("__qid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("rank", F.col("content").alias("content")))),
                    lambda s: F.struct(s["content"].alias("content")),
                ).alias("search_results")
            )
        )
        return queries.join(packed, "__qid", "left").drop("__qid")

    def _text_search(self, table: str, corpus_name: str, k: int, text_col: str) -> DataFrame:
        """``TEXT_SEARCH(corpus, k, question)``: the keyword twin of
        ``FEDERATED_SEARCH`` (extension surface — the reference only ships
        the vector leg). Appends ``search_results ARRAY<STRUCT<content>>``
        with the top-k BM25 matches from the corpus' registered text
        index."""
        from confluent_kafka_vector_search_prompt_inference_spark.operators.bm25 import bm25_search

        idx = self.catalog.text_index(corpus_name)
        queries = self.catalog.table(table).withColumn(
            "__qid", F.md5(F.to_json(F.struct("*")))
        )
        corpus = self.catalog.table(corpus_name)
        hits = bm25_search(
            corpus.select(F.col(idx.id_column).alias("doc_id"), F.col(idx.column).alias("text")),
            queries.select("__qid", F.col(text_col).alias("query_text")).withColumnRenamed("__qid", "query_id"),
            k=k, k1=idx.k1, b=idx.b,
        )
        packed = (
            hits.join(
                F.broadcast(corpus.select(F.col(idx.id_column).alias("doc_id"), F.col(idx.column))),
                "doc_id",
            )
            .groupBy("query_id")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("rank", F.col(idx.column).alias("content")))),
                    lambda s: F.struct(s["content"].alias("content")),
                ).alias("search_results")
            )
            .withColumnRenamed("query_id", "__qid")
        )
        return queries.join(packed, "__qid", "left").drop("__qid")

    def _rewrite_json_object(self, statement: str) -> str:
        """``JSON_OBJECT('k' VALUE v, ...)`` → ``to_json(named_struct('k', v,
        ...))`` — returns a JSON string, the reference's proven semantic
        (``README.md:598``)."""
        out = []
        idx = 0
        pattern = re.compile(r"JSON_OBJECT\s*\(", re.IGNORECASE)
        while m := pattern.search(statement, idx):
            out.append(statement[idx : m.start()])
            depth = 1
            i = m.end()
            while i < len(statement) and depth:
                depth += {"(": 1, ")": -1}.get(statement[i], 0)
                i += 1
            body = statement[m.end() : i - 1]
            body = _JSON_OBJECT_PAIR.sub(lambda mm: f"'{mm.group('key')}', ", body)
            out.append(f"to_json(named_struct({body}))")
            idx = i
        out.append(statement[idx:])
        return "".join(out)
