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


def test_synthesize_video_container_layout(spark):
    import hashlib
    from ditto_spark.operators.multimodal import synthesize_video

    vids = {r.doc_id: r for r in synthesize_video(_docs(spark)).collect()}
    for doc_id, r in vids.items():
        p = bytes(r.payload)
        assert p[:8] == b"FAKEVID1"
        nf = int.from_bytes(p[8:12], "big")
        assert nf == r.n_frames and 4 <= nf <= 35
        assert len(p) == 12 + nf * 16
        # frame i is md5(doc_id:i) raw bytes
        for i in (0, nf - 1):
            exp = hashlib.md5(f"{doc_id}:{i}".encode()).digest()
            assert p[12 + i * 16 : 12 + (i + 1) * 16] == exp


def test_sample_frames_uniform_and_exact_slices(spark):
    import hashlib
    from ditto_spark.operators.multimodal import synthesize_video, sample_frames

    vids = synthesize_video(_docs(spark))
    out = sample_frames(vids, n_sample=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.sample_idx)
        nf = rows[0].n_frames
        m = min(4, nf)
        assert len(rows) == m
        for j, r in enumerate(rows):
            assert r.sample_idx == j
            assert r.frame_idx == (j * nf) // m
            exp = hashlib.md5(f"{doc_id}:{r.frame_idx}".encode())
            assert bytes(r.frame) == exp.digest()
            assert r.frame_hex == exp.hexdigest()
        assert rows[0].frame_idx == 0  # first frame always included


def test_sample_frames_fewer_frames_than_requested(spark):
    from ditto_spark.operators.multimodal import synthesize_video, sample_frames

    vids = synthesize_video(_docs(spark))
    out = sample_frames(vids, n_sample=1000).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.frame_idx)
    for doc_id, idxs in by_doc.items():
        nf = [r.n_frames for r in out if r.doc_id == doc_id][0]
        assert idxs == set(range(nf))  # all frames, each exactly once


def test_resize_media_nearest_neighbor(spark):
    import numpy as np
    from ditto_spark.operators.multimodal import (
        resize_media,
        synthesize_media,
        _decode_fake,
    )

    media = synthesize_media(_docs(spark))
    out = {r.doc_id: r for r in resize_media(media, 5, 3).collect()}
    src = {r.doc_id: bytes(r.payload) for r in media.collect()}
    for doc_id, r in out.items():
        w, h, body = _decode_fake(bytes(r.payload))
        assert (w, h) == (5, 3) == (r.width, r.height)
        assert len(body) == 15
        src_body = np.frombuffer(src[doc_id][16:], dtype=np.uint8)
        idx = ((np.arange(15) + 0.5) / 15 * len(src_body)).astype(np.int64)
        assert (body == src_body[idx]).all()


def test_resize_media_partition_invariant(spark):
    from ditto_spark.operators.multimodal import resize_media, synthesize_media

    media = synthesize_media(_docs(spark))
    a = sorted((r.doc_id, bytes(r.payload)) for r in resize_media(media, 4, 4).collect())
    b = sorted(
        (r.doc_id, bytes(r.payload))
        for r in resize_media(media.repartition(5), 4, 4).collect()
    )
    assert a == b


def test_sample_frames_zero_frame_video_emits_nothing(spark):
    """A malformed zero-frame container contributes no rows instead of
    failing the whole job with an ANSI divide-by-zero."""
    from ditto_spark.operators.multimodal import sample_frames, synthesize_video

    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [("a", "one"), ("b", "two")], "doc_id string, text string"
    )
    vids = synthesize_video(docs)
    broken = vids.withColumn(
        "n_frames",
        F.when(F.col("doc_id") == "a", F.lit(0)).otherwise(F.col("n_frames")),
    )
    got = sample_frames(broken, n_sample=3).collect()
    assert all(r["doc_id"] == "b" for r in got) and len(got) == 3


def test_media_feature_short_payload_error_names_record(spark):
    """A truncated payload fails with a locatable error, not a numpy
    reshape mismatch."""
    import pytest as _pytest

    from ditto_spark.operators.multimodal import extract_media_features

    bad = spark.createDataFrame(
        [("x", "image", bytearray(b"abc"))],
        "doc_id string, media_type string, payload binary",
    )
    with _pytest.raises(Exception, match="doc_id='x'"):
        extract_media_features(bad).collect()
