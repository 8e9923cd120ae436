"""SQL shim: the reference's Flink statement forms run on Spark
(SURVEY.md §2.10, M5). Statements below are near-verbatim reference shapes
(cited per test)."""

import json

import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.catalog import Catalog, SinkSchemaMismatch
from confluent_kafka_vector_search_prompt_inference_spark.models import HashingEmbedder
from confluent_kafka_vector_search_prompt_inference_spark.sqlshim import EngineSession


@pytest.fixture()
def engine(spark, tmp_path):
    cat = Catalog(spark)
    # user_questions topic stand-in (README.md:266-274 schema, minus vector)
    questions = spark.createDataFrame(
        [
            ("user", "mens formal shoes in medium", "abc123"),
            ("user", "little girl shoes in medium", "abc124"),
        ],
        "role string, content string, sessionid string",
    )
    qpath = str(tmp_path / "user_questions.parquet")
    questions.write.parquet(qpath)
    cat.add_table("user_questions", qpath)

    # product corpus with vectors (README.md:355-366 stand-in)
    emb = HashingEmbedder(dim=16)
    products = [
        (i, f"product {w} shoes, product_id: {i}", emb.embed_batch([f"product {w} shoes"])[0])
        for i, w in enumerate(["formal mens", "girl", "running", "dress", "sandal"])
    ]
    pdf = spark.createDataFrame(
        products, "product_id bigint, content string, vector array<float>"
    )
    ppath = str(tmp_path / "product.parquet")
    pdf.write.parquet(ppath)
    cat.add_table("product", ppath)

    # user_questions_vector sink (README.md:266-274)
    sink = spark.createDataFrame(
        [], "role string, content string, sessionid string, vector array<float>"
    )
    spath = str(tmp_path / "user_questions_vector.parquet")
    sink.write.parquet(spath)
    cat.add_table("user_questions_vector", spath)
    cat.register_views()

    eng = EngineSession(spark, cat)
    eng.sql(
        "CREATE MODEL `vector_encoding` INPUT (`input` STRING) OUTPUT (`vector` ARRAY<FLOAT>) "
        "WITH ('task'='embedding', 'provider'='local', 'dim'='16')"
    )  # README.md:205-213
    return eng


def test_create_and_describe_model(spark, engine):
    df = engine.sql("DESCRIBE MODEL vector_encoding")
    row = df.first()
    assert row.name == "vector_encoding" and row.version == 1 and row.is_default


def test_model_versioning_and_alter(spark, engine):
    engine.sql(
        "CREATE MODEL `vector_encoding` INPUT (`input` STRING) OUTPUT (`vector` ARRAY<FLOAT>) "
        "WITH ('task'='embedding', 'dim'='32')"
    )
    assert engine.registry.get("vector_encoding").version == 1  # README.md:718
    engine.sql("ALTER MODEL `vector_encoding` SET ('default_version'='2')")  # README.md:712-714
    assert engine.registry.get("vector_encoding").version == 2
    both = engine.sql("DESCRIBE MODEL vector_encoding$all")
    assert both.count() == 2  # README.md:661


def test_lateral_ml_predict_select(spark, engine):
    """SELECT form of the embedding pipeline (README.md:279-281)."""
    df = engine.sql(
        "SELECT `role`, `content`, `sessionid`, `vector` "
        "FROM user_questions, LATERAL TABLE(ml_predict('vector_encoding', content))"
    )
    rows = df.collect()
    assert len(rows) == 2 and all(len(r.vector) == 16 for r in rows)


def test_insert_select_with_sink_check(spark, engine):
    """INSERT form (README.md:286-288) lands rows through the schema check."""
    engine.sql(
        "INSERT INTO user_questions_vector "
        "SELECT `role`, `content`, `sessionid`, `vector` "
        "FROM user_questions, LATERAL TABLE(ml_predict('vector_encoding', content))"
    )
    assert engine.catalog.table("user_questions_vector").count() == 2


def test_insert_schema_mismatch_fails(spark, engine):
    """Mismatched insert fails at analysis time (README.md:586-594)."""
    with pytest.raises(SinkSchemaMismatch):
        engine.sql(
            "INSERT INTO user_questions_vector "
            "SELECT `role`, `content`, `sessionid` FROM user_questions"
        )


def test_federated_search_lateral(spark, engine):
    """FEDERATED_SEARCH top-3 lateral join (README.md:403-407, 438-446)."""
    engine.sql(
        "INSERT INTO user_questions_vector "
        "SELECT `role`, `content`, `sessionid`, `vector` "
        "FROM user_questions, LATERAL TABLE(ml_predict('vector_encoding', content))"
    )
    df = engine.sql(
        "SELECT `content`, `sessionid`, search_results AS products "
        "FROM user_questions_vector, LATERAL TABLE(FEDERATED_SEARCH('product', 3, vector))"
    )
    rows = df.collect()
    assert len(rows) == 2
    for r in rows:
        assert len(r.products) == 3
        assert all(p.content for p in r.products)


def test_json_object_returns_string(spark, engine):
    """JSON_OBJECT builds a JSON *string* (README.md:598, 504-507)."""
    df = engine.sql(
        "SELECT JSON_OBJECT('role' VALUE role, 'q' VALUE content) AS j FROM user_questions"
    )
    row = df.first()
    assert isinstance(row.j, str)
    body = json.loads(row.j)
    assert body["role"] == "user" and "q" in body


def test_insert_values_nested_array_row(spark, engine, tmp_path):
    """Literal insert with ARRAY[ROW(...)] constructors (README.md:616-623)."""
    sink = spark.createDataFrame(
        [], "role string, content string, sessionid string, products array<struct<content:string>>"
    )
    path = str(tmp_path / "user_prompts.parquet")
    sink.write.parquet(path)
    engine.catalog.add_table("user_prompts", path)
    engine.sql(
        "INSERT INTO user_prompts VALUES "
        "('user', 'I need shoes', '8888', "
        "ARRAY[ROW('Blue Shoes, product_id: 101'), ROW('Red Shoes, product_id: 102')])"
    )
    row = engine.catalog.table("user_prompts").first()
    assert row.sessionid == "8888"
    assert [p.content for p in row.products] == [
        "Blue Shoes, product_id: 101",
        "Red Shoes, product_id: 102",
    ]


def test_insert_values_brackets_inside_strings(spark, engine, tmp_path):
    """Brackets and constructor keywords inside string literals survive the
    Flink→Spark constructor translation (ADVICE r1: the old blanket
    ``.replace("]", ")")`` corrupted them)."""
    sink = spark.createDataFrame(
        [], "content string, tags array<string>"
    )
    path = str(tmp_path / "bracket_sink.parquet")
    sink.write.parquet(path)
    engine.catalog.add_table("bracket_sink", path)
    engine.sql(
        "INSERT INTO bracket_sink VALUES "
        "('size [large] and it''s ROW(ish)', ARRAY['a[0]', 'b]c'])"
    )
    row = engine.catalog.table("bracket_sink").first()
    assert row.content == "size [large] and it's ROW(ish)"
    assert list(row.tags) == ["a[0]", "b]c"]


def test_translate_constructors_unit():
    from confluent_kafka_vector_search_prompt_inference_spark.sqlshim import _translate_constructors

    assert _translate_constructors("ARRAY[ROW('x'), ROW('y')]") == "array(struct('x'), struct('y'))"
    assert _translate_constructors("'keep [this] and ARRAY[that]'") == "'keep [this] and ARRAY[that]'"
    assert _translate_constructors("GROW(1)") == "GROW(1)"  # no false ROW( match
    assert _translate_constructors("ARRAY['a]b', 'c']") == "array('a]b', 'c')"


def test_ml_predict_version_pinning(spark, engine):
    """Call-site version pin model$N (README.md:704-708)."""
    engine.sql(
        "CREATE MODEL `vector_encoding` INPUT (`input` STRING) OUTPUT (`vector` ARRAY<FLOAT>) "
        "WITH ('task'='embedding', 'dim'='32')"
    )
    df = engine.sql(
        "SELECT `vector` FROM user_questions, "
        "LATERAL TABLE(ml_predict('vector_encoding$2', content))"
    )
    assert all(len(r.vector) == 32 for r in df.collect())
    df1 = engine.sql(
        "SELECT `vector` FROM user_questions, "
        "LATERAL TABLE(ml_predict('vector_encoding$1', content))"
    )
    assert all(len(r.vector) == 16 for r in df1.collect())


def test_connection_not_found(spark, engine):
    """Unknown connection fails at statement time (README.md:312-316)."""
    from confluent_kafka_vector_search_prompt_inference_spark.sqlshim import ConnectionNotFound

    with pytest.raises(ConnectionNotFound, match="openai-connection"):
        engine.sql(
            "CREATE MODEL `llm` INPUT (`prompts` STRING) OUTPUT (`json_response` STRING) "
            "WITH ('task'='text_generation', 'openai.connection'='openai-connection')"
        )
    engine.create_connection("openai-connection", endpoint="https://api.openai.com")
    engine.sql(
        "CREATE MODEL `llm` INPUT (`prompts` STRING) OUTPUT (`json_response` STRING) "
        "WITH ('task'='text_generation', 'openai.connection'='openai-connection')"
    )  # README.md:469-480 shape
    assert engine.registry.get("llm").task == "text_generation"


def test_describe_table(spark, engine):
    """DESCRIBE table (SURVEY.md §2.1 S8)."""
    out = spark.sql("DESCRIBE user_questions").collect()
    cols = {r.col_name: r.data_type for r in out}
    assert cols.get("content") == "string" and cols.get("sessionid") == "string"


def test_vector_index_metadata(spark, engine):
    """Index options resolve from catalog metadata (README.md:355-366):
    a cosine-metric index changes scoring; defaults hold otherwise."""
    from confluent_kafka_vector_search_prompt_inference_spark.catalog import VectorIndex

    idx = engine.catalog.register_vector_index(
        "product", column="vector", id_column="product_id",
        metric="cosine", num_candidates=50,
    )
    assert engine.catalog.vector_index("product") is idx
    engine.sql(
        "INSERT INTO user_questions_vector "
        "SELECT `role`, `content`, `sessionid`, `vector` "
        "FROM user_questions, LATERAL TABLE(ml_predict('vector_encoding', content))"
    )
    df = engine.sql(
        "SELECT sessionid, search_results FROM user_questions_vector, "
        "LATERAL TABLE(FEDERATED_SEARCH('product', 2, vector))"
    )
    rows = df.collect()
    assert all(len(r.search_results) == 2 for r in rows)
    # unregistered table falls back to defaults (dot, numCandidates 20)
    default = engine.catalog.vector_index("unregistered")
    assert default.metric == "dot" and default.num_candidates == 20


def test_create_table_statement(spark, engine):
    """CREATE TABLE with Flink types incl. nested ROW (README.md:413-421)."""
    engine.sql(
        "CREATE TABLE user_prompts2 (role STRING, content STRING, sessionid STRING, "
        "products ARRAY<ROW<content STRING>>) WITH ('value.format'='json-registry')"
    )
    df = engine.catalog.table("user_prompts2")
    assert df.schema["products"].dataType.simpleString() == "array<struct<content:string>>"
    engine.sql(
        "INSERT INTO user_prompts2 VALUES ('user', 'q', 's1', ARRAY[ROW('item a')])"
    )
    assert engine.catalog.table("user_prompts2").count() == 1


def test_create_table_untyped_row_rejected(spark, engine):
    """The ROW<> pitfall fails at DDL time (README.md:552-594)."""
    with pytest.raises(ValueError, match="ROW<>"):
        engine.sql(
            "CREATE TABLE bad_table (sessionid STRING, llm_request ROW<>) "
            "WITH ('value.format'='json-registry')"
        )


def test_python_udtf_lateral(spark):
    """User-authored UDTF + SQL LATERAL (SURVEY.md §2.10 — the engine ships
    the UDTF surface the reference's author wished for, README.md:501)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").split()):
                yield w, i

    spark.udtf.register("split_words", SplitWords)
    spark.createDataFrame(
        [("the quick fox",), ("hello world",)], "line string"
    ).createOrReplaceTempView("lines")
    out = spark.sql(
        "SELECT line, word, pos FROM lines, LATERAL split_words(line)"
    ).collect()
    assert len(out) == 5
    assert {(r.word, r.pos) for r in out if r.line == "hello world"} == {
        ("hello", 0), ("world", 1)
    }


def test_text_search_lateral(spark, engine):
    """TEXT_SEARCH — the keyword twin of FEDERATED_SEARCH: BM25 top-k over
    the corpus' registered text index, same search_results shape."""
    engine.catalog.register_text_index("product", column="content", id_column="product_id")
    df = engine.sql(
        "SELECT `content`, search_results AS products "
        "FROM user_questions, LATERAL TABLE(TEXT_SEARCH('product', 2, content))"
    )
    rows = {r.content: r.products for r in df.collect()}
    assert len(rows) == 2
    # BM25 only surfaces docs sharing ≥1 term, so lists hold 1..k entries
    for products in rows.values():
        assert 1 <= len(products) <= 2
    # "girl shoes" query retrieves the girl-shoes product first
    girl = rows["little girl shoes in medium"]
    assert "girl" in girl[0].content
    mens = rows["mens formal shoes in medium"]
    assert "mens" in mens[0].content


def test_show_models_and_explain(spark, engine):
    """SHOW MODELS lists the registry; EXPLAIN surfaces the physical plan
    of a (lateral-rewritten) statement as a row — the pre-flight check a
    user runs before launching a continuous statement."""
    engine.sql(
        "CREATE MODEL `retail_assistant` INPUT (`prompt` STRING) "
        "OUTPUT (`json_response` STRING) "
        "WITH ('task'='text_generation', 'provider'='local')"
    )
    models = {r.name: (r.task, r.versions) for r in engine.sql("SHOW MODELS").collect()}
    assert models["vector_encoding"] == ("embedding", 1)
    assert models["retail_assistant"] == ("text_generation", 1)

    [row] = engine.sql(
        "EXPLAIN SELECT `content`, `vector` "
        "FROM user_questions, LATERAL TABLE(ml_predict('vector_encoding', content))"
    ).collect()
    assert "Physical Plan" in row.plan or "(1)" in row.plan
