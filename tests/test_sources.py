"""Sources: schema-registry decode (late-bound contracts), Kafka wire shape,
multimodal plumbing, catalog."""

import pytest
from pyspark.sql import functions as F

from confluent_kafka_vector_search_prompt_inference_spark.catalog import Catalog
from confluent_kafka_vector_search_prompt_inference_spark.sources.kafka import kafka_sink_options, to_kafka_shape
from confluent_kafka_vector_search_prompt_inference_spark.sources.multimodal import with_image_features
from confluent_kafka_vector_search_prompt_inference_spark.sources.registry import (
    SchemaRegistry,
    decode_json_topic,
    json_schema_to_struct,
)

# the reference's user_questions data contract, README.md:228-252
QUESTIONS_CONTRACT = """
{
  "type": "object",
  "properties": {
    "role": {"type": "string"},
    "content": {"type": "string"},
    "sessionid": {"type": "string"},
    "email": {"type": "string"}
  },
  "additionalProperties": false
}
"""


def test_json_schema_to_struct_contract():
    st = json_schema_to_struct(QUESTIONS_CONTRACT)
    assert [f.name for f in st.fields] == ["role", "content", "sessionid", "email"]
    assert all(f.dataType.simpleString() == "string" for f in st.fields)


def test_nested_array_and_numbers():
    st = json_schema_to_struct(
        '{"type":"object","properties":{"v":{"type":"array","items":{"type":"number"}},'
        '"n":{"type":"integer"}}}'
    )
    assert st["v"].dataType.simpleString() == "array<double>"
    assert st["n"].dataType.simpleString() == "bigint"


def test_schemaless_topic_unreadable():
    reg = SchemaRegistry()
    with pytest.raises(KeyError, match="no data contract"):
        reg.latest("user_questions")  # README.md:221-223


def test_decode_roundtrip(spark):
    """Wire bytes → contract decode → typed columns (README.md:225-257)."""
    reg = SchemaRegistry()
    reg.register("user_questions", QUESTIONS_CONTRACT)
    rows = spark.createDataFrame(
        [("user", "mens shoes", "abc123", "u@x.com")],
        "role string, content string, sessionid string, email string",
    )
    wire = to_kafka_shape(rows, key_col=None, value_cols=["role", "content", "sessionid", "email"])
    assert wire.columns == ["key", "value"]
    decoded = decode_json_topic(wire, reg, "user_questions")
    row = decoded.first()
    assert (row.role, row.content, row.sessionid) == ("user", "mens shoes", "abc123")


def test_schema_evolution_latest_wins(spark):
    reg = SchemaRegistry()
    v1 = reg.register("t", '{"type":"object","properties":{"a":{"type":"string"}}}')
    v2 = reg.register(
        "t", '{"type":"object","properties":{"a":{"type":"string"},"b":{"type":"integer"}}}'
    )
    assert (v1, v2) == (1, 2)
    assert [f.name for f in reg.latest("t").fields] == ["a", "b"]  # README.md:610-612


def test_kafka_sink_options():
    assert kafka_sink_options("broker:9092", "user_prompts") == {
        "kafka.bootstrap.servers": "broker:9092",
        "topic": "user_prompts",
    }


def test_multimodal_features_real_pixels(spark):
    """with_image_features decodes REAL PNG bytes and its stats match an
    independent NumPy computation over the source pixels."""
    import numpy as np

    from confluent_kafka_vector_search_prompt_inference_spark.sources.codecs import png_encode

    rng = np.random.default_rng(7)
    img_a = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    img_b = rng.integers(0, 256, size=(5, 5), dtype=np.uint8)
    media = spark.createDataFrame(
        [
            (("image/png", "mem://a", bytearray(png_encode(img_a))),),
            (("image/png", "mem://b", bytearray(png_encode(img_b))),),
        ],
        "media struct<mime:string,uri:string,bytes:binary>",
    )
    out = with_image_features(media).toPandas().sort_values("uri").reset_index(drop=True)
    assert all(len(f) == 32 for f in out.features)
    fa = out.features[0]
    assert (fa[0], fa[1], fa[2]) == (8.0, 6.0, 3.0)
    lum = img_a.astype(np.float64).mean(axis=2)
    assert abs(fa[3] - np.float32(lum.mean())) < 1e-6
    assert fa[5] == np.float32(lum.min()) and fa[6] == np.float32(lum.max())
    fb = out.features[1]
    assert (fb[0], fb[1], fb[2]) == (5.0, 5.0, 1.0)
    assert abs(fb[3] - np.float32(img_b.mean())) < 1e-6
    # determinism: same bytes -> same features
    again = with_image_features(media).toPandas().sort_values("uri").reset_index(drop=True)
    assert str(out.features.tolist()) == str(again.features.tolist())


def test_decode_image_rejects_unknown_formats():
    from confluent_kafka_vector_search_prompt_inference_spark.sources.multimodal import decode_image

    with pytest.raises(ValueError):
        decode_image(b"not an image")
    # JPEG decodes for real since round 6; a TRUNCATED stream still
    # raises rather than returning garbage
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg header")


def test_catalog_roundtrip(spark, tmp_path):
    cat = Catalog(spark)
    df = spark.range(5).toDF("id")
    path = str(tmp_path / "t.parquet")
    df.write.parquet(path)
    cat.add_table("t", path)
    assert cat.table("t").count() == 5
    with pytest.raises(KeyError):
        cat.table("missing")


def test_frame_sample_fanout(spark):
    from confluent_kafka_vector_search_prompt_inference_spark.sources.multimodal import frame_sample

    media = spark.createDataFrame(
        [(("video/mp4", "mem://v1", bytes(range(64))),)],
        "media struct<mime:string,uri:string,bytes:binary>",
    )
    frames = frame_sample(media, n_frames=4).collect()
    assert len(frames) == 4
    assert [f.frame_idx for f in frames] == [0, 1, 2, 3]
    assert all(len(f.frame_bytes) == 16 for f in frames)
    # deterministic: same input → same chunks
    again = frame_sample(media, n_frames=4).collect()
    assert [bytes(f.frame_bytes) for f in frames] == [bytes(f.frame_bytes) for f in again]


def test_frame_sample_wav_segments_are_playable(spark):
    """audio/wav frame sampling decodes for real: each emitted frame is a
    standalone WAV whose samples are the corresponding source segment."""
    import numpy as np

    from confluent_kafka_vector_search_prompt_inference_spark.sources.codecs import wav_decode, wav_encode
    from confluent_kafka_vector_search_prompt_inference_spark.sources.multimodal import frame_sample

    s = (np.arange(80, dtype=np.int16) * 100) - 4000
    media = spark.createDataFrame(
        [(("audio/wav", "mem://a1", bytearray(wav_encode(s, 8000))),)],
        "media struct<mime:string,uri:string,bytes:binary>",
    )
    frames = sorted(frame_sample(media, n_frames=4).collect(), key=lambda r: r.frame_idx)
    assert len(frames) == 4
    for i, f in enumerate(frames):
        seg, rate = wav_decode(bytes(f.frame_bytes))
        assert rate == 8000
        assert np.array_equal(seg[:, 0], s[i * 20 : (i + 1) * 20])


# ---------------------------------------------------------------------------
# Round 9: WARC ingestion (ISO 28500 — the Common Crawl shape)


def test_warc_roundtrip_plain_and_gzip_members():
    from confluent_kafka_vector_search_prompt_inference_spark.sources.warc import (
        http_response,
        warc_encode,
        warc_parse,
    )

    recs = [
        {"type": "warcinfo", "uri": None, "payload": b"software: fixture\r\n"},
        {"type": "response", "uri": "https://e.org/a",
         "payload": http_response(b"<html>hi</html>")},
        {"type": "request", "uri": "https://e.org/a",
         "payload": b"GET /a HTTP/1.1\r\n\r\n"},
        {"type": "response", "uri": "https://e.org/b",
         "payload": http_response(b"{}", status=404,
                                  content_type="application/json")},
    ]
    for gz in (False, True):
        out = warc_parse(warc_encode(recs, gzip_members=gz))
        assert [r["type"] for r in out] == [
            "warcinfo", "response", "request", "response",
        ]
        assert out[1]["http_status"] == 200
        assert out[1]["body"] == b"<html>hi</html>"
        assert out[3]["http_status"] == 404
        assert out[3]["http_content_type"] == "application/json"
        # non-response records carry raw payload, HTTP fields None
        assert out[2]["http_status"] is None
        assert out[2]["body"].startswith(b"GET /a")
    # gzip encode is byte-deterministic (mtime pinned)
    assert warc_encode(recs, gzip_members=True) == warc_encode(
        recs, gzip_members=True
    )


def test_warc_rejects_garbage_truncation_and_bad_framing():
    import pytest as _pytest

    from confluent_kafka_vector_search_prompt_inference_spark.sources.warc import (
        http_response,
        warc_encode,
        warc_parse,
    )

    recs = [{"type": "response", "uri": "https://e.org/a",
             "payload": http_response(b"x" * 64)}]
    data = warc_encode(recs)
    with _pytest.raises(ValueError, match="WARC"):
        warc_parse(b"totally not an archive")
    with _pytest.raises(ValueError, match="truncated|declares"):
        warc_parse(data[:-40])
    with _pytest.raises(ValueError, match="gzip"):
        warc_parse(b"\x1f\x8b" + b"\x00" * 32)
    # a response whose payload is NOT an HTTP message degrades to raw
    # body (crawl archives carry protocol garbage), never raises
    weird = warc_parse(
        warc_encode([{"type": "response", "uri": "u", "payload": b"\x00\x01"}])
    )
    assert weird[0]["http_status"] is None and weird[0]["body"] == b"\x00\x01"


def test_warc_chunked_transfer_encoding_decodes_and_degrades():
    from confluent_kafka_vector_search_prompt_inference_spark.sources.warc import warc_encode, warc_parse

    # a well-formed chunked response (non-Common-Crawl archives keep the
    # origin server's framing): two chunks + a chunk extension + trailer
    chunked_msg = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n"
        b"\r\n"
        b"5;ext=1\r\nhello\r\n"
        b"6\r\n world\r\n"
        b"0\r\n"
        b"X-Trailer: t\r\n\r\n"
    )
    out = warc_parse(
        warc_encode([{"type": "response", "uri": "u", "payload": chunked_msg}])
    )
    assert out[0]["http_status"] == 200
    assert out[0]["body"] == b"hello world"

    # malformed chunk framing degrades to the RAW body bytes with the
    # status still parsed — protocol garbage must not drop the record
    bad = (
        b"HTTP/1.1 200 OK\r\n"
        b"Transfer-Encoding: chunked\r\n"
        b"\r\n"
        b"ZZ\r\nnot hex\r\n"
    )
    out = warc_parse(
        warc_encode([{"type": "response", "uri": "u", "payload": bad}])
    )
    assert out[0]["http_status"] == 200
    assert out[0]["body"] == b"ZZ\r\nnot hex\r\n"

    # a chunk whose declared size overruns the payload also degrades
    overrun = (
        b"HTTP/1.1 200 OK\r\n"
        b"Transfer-Encoding: chunked\r\n"
        b"\r\n"
        b"FF\r\nshort\r\n"
    )
    out = warc_parse(
        warc_encode([{"type": "response", "uri": "u", "payload": overrun}])
    )
    assert out[0]["body"] == b"FF\r\nshort\r\n"


def test_warc_incremental_framing_is_layout_equal():
    """The incremental framer must produce identical records whether the
    archive arrives as one plain buffer or as per-record gzip members
    (member boundaries land mid-record-separator), and records must
    stream out without materializing the archive."""
    from confluent_kafka_vector_search_prompt_inference_spark.sources.warc import (
        http_response,
        warc_encode,
        warc_parse,
        warc_parse_iter,
    )

    recs = [
        {"type": "response", "uri": f"https://e.org/{i}",
         "payload": http_response(f"doc {i} ".encode() * (1 + i % 7))}
        for i in range(40)
    ]
    plain = warc_parse(warc_encode(recs))
    gz = warc_parse(warc_encode(recs, gzip_members=True))
    assert plain == gz
    assert len(plain) == 40
    # iterator face: first record is available without exhausting input
    it = warc_parse_iter(warc_encode(recs, gzip_members=True))
    first = next(it)
    assert first["uri"] == "https://e.org/0"
    assert sum(1 for _ in it) == 39


def test_read_warc_spark_surface(spark):
    import pandas as pd

    from confluent_kafka_vector_search_prompt_inference_spark.sources.warc import (
        http_response,
        read_warc,
        warc_encode,
    )

    blobs = []
    for i in range(3):
        blobs.append(
            warc_encode(
                [
                    {"type": "response", "uri": f"https://e.org/{i}",
                     "payload": http_response(f"doc {i}".encode())},
                ],
                gzip_members=i % 2 == 1,
            )
        )
    df = spark.createDataFrame(
        pd.DataFrame({"path": [f"seg{i}.warc" for i in range(3)],
                      "content": blobs})
    )
    got = read_warc(df).orderBy("path").collect()
    assert [r["uri"] for r in got] == [f"https://e.org/{i}" for i in range(3)]
    assert all(r["http_status"] == 200 for r in got)
    assert [bytes(r["body"]) for r in got] == [b"doc 0", b"doc 1", b"doc 2"]
