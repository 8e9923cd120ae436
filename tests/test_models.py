"""Model registry semantics from the reference (SURVEY.md §2.10):
first-version default (README.md:718), $version pinning (README.md:704-708),
ALTER default (README.md:712-714), DESCRIBE (README.md:660-699), 404 on
missing version (README.md:657), golden provider-response parsing
(files/sampleVectorSearches/test.txt)."""

import json
import os

import pytest

from confluent_kafka_vector_search_prompt_inference_spark.models import (
    HashingEmbedder,
    ModelNotFound,
    ModelRegistry,
    TemplateLLM,
    parse_embedding_response,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "fixtures", "embedding_response_golden.json")


@pytest.fixture()
def registry():
    r = ModelRegistry()
    r.create_model("vector_encoding", "embedding", HashingEmbedder(dim=16))
    return r


def test_first_version_is_default(registry):
    registry.create_model("vector_encoding", "embedding", HashingEmbedder(dim=32))
    assert registry.get("vector_encoding").version == 1  # README.md:718
    assert registry.get("vector_encoding$2").provider.dim == 32


def test_alter_default(registry):
    registry.create_model("vector_encoding", "embedding", HashingEmbedder(dim=32))
    registry.alter_default("vector_encoding", 2)
    assert registry.get("vector_encoding").version == 2


def test_missing_version_404(registry):
    with pytest.raises(ModelNotFound):
        registry.get("vector_encoding$9")  # README.md:657
    with pytest.raises(ModelNotFound):
        registry.get("nope")
    with pytest.raises(ModelNotFound):
        registry.alter_default("vector_encoding", 9)


def test_describe_all(spark, registry):
    registry.create_model("vector_encoding", "embedding", HashingEmbedder(dim=32))
    one = registry.describe(spark, "vector_encoding").collect()
    assert len(one) == 1 and one[0].version == 1 and one[0].is_default
    both = registry.describe(spark, "vector_encoding$all").collect()
    assert [r.version for r in both] == [1, 2]


def test_embedder_deterministic_and_normalized(registry):
    e = registry.get("vector_encoding").provider
    v1, v2 = e.embed_batch(["hello world"]), e.embed_batch(["hello world"])
    assert v1 == v2
    norm = sum(x * x for x in v1[0]) ** 0.5
    assert norm == pytest.approx(1.0)
    # shared tokens → closer than disjoint tokens
    a, b, c = e.embed_batch(["red shoes", "red boots", "quantum flux"])
    dot_ab = sum(x * y for x, y in zip(a, b))
    dot_ac = sum(x * y for x, y in zip(a, c))
    assert dot_ab > dot_ac


def test_ml_predict_appends_column(spark, registry):
    df = spark.createDataFrame([("a question",)], "content string")
    out = registry.ml_predict(df, "vector_encoding", "content")
    row = out.first()
    assert out.columns == ["content", "vector"]
    assert len(row.vector) == 16


def test_template_llm_json_shape():
    llm = TemplateLLM()
    (resp,) = llm.complete_batch(["what shoes?"])
    body = json.loads(resp)
    assert body["role"] == "assistant" and "content" in body


def test_parse_golden_embedding_response():
    """Golden capture from the reference repo (1536 floats, README.md:144-168)."""
    with open(GOLDEN) as f:
        payload = f.read()
    vecs = parse_embedding_response(payload)
    assert len(vecs) == 1 and len(vecs[0]) == 1536
    body = json.loads(payload)
    assert body["model"] == "text-embedding-3-small"
    assert body["usage"]["prompt_tokens"] in (11, 12)  # README.md:164-166


def test_all_golden_payloads_parse():
    """All four captured provider responses from the reference repo
    (files/sampleVectorSearches/) parse to 1536-dim vectors."""
    import glob

    files = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "fixtures", "embedding_*.json")))
    assert len(files) == 4
    for path in files:
        with open(path) as f:
            vecs = parse_embedding_response(f.read())
        assert len(vecs) == 1 and len(vecs[0]) == 1536
