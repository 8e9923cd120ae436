import pytest

from confluent_kafka_vector_search_prompt_inference_spark import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("spark-graft-tests")
    yield spark


@pytest.fixture(scope="session")
def sf_smoke():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correct():
    return SF_CORRECT


@pytest.fixture(scope="session")
def docs(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/documents.parquet")


@pytest.fixture(scope="session")
def embeddings(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
