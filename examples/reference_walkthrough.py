"""The reference tutorial, end to end, on this engine.

Reproduces the reference README's full Flink-SQL flow (statement shapes
near-verbatim, reference lines cited inline) against local deterministic
providers — the exact sequence a user of the reference would run after
switching: models, topic tables, the continuous embed INSERT-SELECT, the
FEDERATED_SEARCH retrieval join, prompt assembly with JSON_OBJECT, and the
LLM answer stage. `python examples/reference_walkthrough.py` prints each
stage's output; `tests/test_walkthrough.py` asserts the flow.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from confluent_kafka_vector_search_prompt_inference_spark.catalog import Catalog
from confluent_kafka_vector_search_prompt_inference_spark.models import HashingEmbedder
from confluent_kafka_vector_search_prompt_inference_spark.sqlshim import EngineSession


def run(spark: SparkSession, workdir: str, verbose: bool = False):
    cat = Catalog(spark)

    # --- topics as tables (README.md:101-105: user_questions topic;
    # README.md:355-366: the vector-indexed product collection) ---------
    questions = spark.createDataFrame(
        [
            ("user", "mens formal shoes in medium", "abc123"),
            ("user", "little girl shoes in medium", "abc124"),
            ("user", "running shoes for trail season", "abc125"),
        ],
        "role string, content string, sessionid string",
    )
    qpath = f"{workdir}/user_questions.parquet"
    questions.write.mode("overwrite").parquet(qpath)
    cat.add_table("user_questions", qpath)

    emb = HashingEmbedder(dim=16)
    words = ["formal mens", "girl", "running trail", "dress", "sandal", "boot"]
    products = [
        (i, f"product {w} shoes, product_id: {i}",
         emb.embed_batch([f"product {w} shoes"])[0])
        for i, w in enumerate(words)
    ]
    ppath = f"{workdir}/product.parquet"
    spark.createDataFrame(
        products, "product_id bigint, content string, vector array<float>"
    ).write.mode("overwrite").parquet(ppath)
    cat.add_table("product", ppath)

    sink = spark.createDataFrame(
        [], "role string, content string, sessionid string, vector array<float>"
    )
    spath = f"{workdir}/user_questions_vector.parquet"
    sink.write.mode("overwrite").parquet(spath)
    cat.add_table("user_questions_vector", spath)
    cat.register_views()

    eng = EngineSession(spark, cat)

    # --- connection + models (README.md:52-96, 205-213, 300-316) -------
    eng.create_connection("openai-connection", endpoint="local", api_key="unused")
    eng.sql(
        "CREATE MODEL `vector_encoding` INPUT (`input` STRING) "
        "OUTPUT (`vector` ARRAY<FLOAT>) "
        "WITH ('task'='embedding', 'provider'='local', 'dim'='16', "
        "'connection'='openai-connection')"
    )
    eng.sql(
        "CREATE MODEL `retail_assistant` INPUT (`prompt` STRING) "
        "OUTPUT (`json_response` STRING) "
        "WITH ('task'='text_generation', 'provider'='local', "
        "'connection'='openai-connection')"
    )

    # --- the continuous embed INSERT-SELECT (README.md:286-288) --------
    eng.sql(
        "INSERT INTO user_questions_vector "
        "SELECT `role`, `content`, `sessionid`, `vector` "
        "FROM user_questions, LATERAL TABLE(ml_predict('vector_encoding', content))"
    )

    # --- FEDERATED_SEARCH top-3 + prompt assembly (README.md:403-446,
    # 726-730: CAST(products AS STRING) into the prompt) ----------------
    prompts = eng.sql(
        "SELECT `content`, `sessionid`, "
        "JSON_OBJECT('prompt' VALUE content, "
        "            'products' VALUE CAST(search_results AS STRING)) AS prompt "
        "FROM user_questions_vector, "
        "LATERAL TABLE(FEDERATED_SEARCH('product', 3, vector))"
    )
    # land the prompts topic like the reference's user_prompts sink
    # (README.md:435-446), then answer from it
    prpath = f"{workdir}/user_prompts.parquet"
    prompts.write.mode("overwrite").parquet(prpath)
    cat.add_table("user_prompts", prpath)
    cat.register_views()

    # --- the LLM answer stage (README.md:487-495) ----------------------
    answers = eng.sql(
        "SELECT `sessionid`, `content`, `json_response` "
        "FROM user_prompts, LATERAL TABLE(ml_predict('retail_assistant', prompt))"
    )
    if verbose:
        prompts.show(truncate=80)
        answers.show(truncate=80)
    return prompts, answers


if __name__ == "__main__":
    import tempfile

    from confluent_kafka_vector_search_prompt_inference_spark import get_spark

    spark = get_spark("reference-walkthrough")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as wd:
        run(spark, wd, verbose=True)
