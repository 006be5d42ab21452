import pytest

from ditto_spark.operators.multimodal import (
    synthesize_media,
    extract_media_features,
    _decode_fake,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "spark shuffle join"), (3, "hello world")],
        "doc_id long, text string",
    )


def test_media_schema_and_header_roundtrip(spark):
    media = synthesize_media(_docs(spark))
    assert [f.name for f in media.schema.fields] == [
        "doc_id", "media_type", "payload", "width", "height",
    ]
    rows = media.collect()
    for r in rows:
        w, h, body = _decode_fake(bytes(r["payload"]))
        assert (w, h) == (r["width"], r["height"])
        assert len(body) == 32  # sha256 body


def test_feature_extraction_deterministic(spark):
    media = synthesize_media(_docs(spark))
    feats = {r["doc_id"]: r for r in extract_media_features(media).collect()}
    assert len(feats) == 3
    # identical text → identical payload → identical features
    assert feats[1]["feature"] == feats[3]["feature"]
    assert feats[1]["feature"] != feats[2]["feature"]
    for r in feats.values():
        assert r["n_bytes"] == 8 + 4 + 4 + 32
        assert abs(sum(x * x for x in r["feature"]) - 1.0) < 1e-5


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        _decode_fake(b"\x89PNG\r\n\x1a\n" + b"0" * 32)
