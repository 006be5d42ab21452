"""Multimodal column plumbing (training-data-pipeline extension — absent
from the reference, which is text-only).

Media ride along as opaque `binary` columns with a typed metadata struct;
decode / feature-extract run as Arrow-batched `mapInPandas` UDFs. The
actual codec step is STUBBED (image/audio libraries are not installed in
this container): `decode_stub=True` substitutes a deterministic fake
decoder (header-parse + byte-statistics) so the Spark-side plumbing —
schema, partitioning, UDF signature, Arrow batch shape — is real and
tested; swap `_decode_fake` for a PIL/libvips call on a real cluster.
"""

from __future__ import annotations

import struct as _struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, width int, height int"
)

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes long, width int, height int, "
    "mean_byte double, feature array<float>"
)

_MAGIC = b"FAKEIMG1"


def _md5_dim(prefix: str) -> F.Column:
    """Deterministic fake dimension in [16, 527], md5-derived so the DuckDB
    oracle regenerates it: ('0x'||substr(md5(prefix||text),1,8))::BIGINT
    % 512 + 16."""
    return (
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(prefix), F.col("text"))), 1, 8),
                16, 10,
            ).cast("bigint"),
            F.lit(512),
        )
        + 16
    ).cast("int")


def synthesize_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media: payload = 8-byte magic + packed (w, h)
    header + sha256 body derived from the text column. Pure JVM expressions
    build the binary (concat of binary-cast pieces); every header/stat field
    is engine-portable (md5/sha256) so feature extraction is fully
    oracle-checkable."""
    w = _md5_dim("w|")
    h = _md5_dim("h|")
    # unhex builds raw bytes (ANSI mode forbids int→binary casts, and sha2
    # returns a hex STRING — casting that to binary would give 64 text bytes)
    body = F.unhex(F.sha2(F.col("text"), 256))
    payload = F.concat(
        F.lit(_MAGIC),
        F.unhex(F.format_string("%08x", w)),
        F.unhex(F.format_string("%08x", h)),
        body,
    )
    return docs.select(
        F.col(id_col),
        F.lit("image").alias("media_type"),
        payload.alias("payload"),
        w.alias("width"),
        h.alias("height"),
    )


def _decode_fake(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for an image decode: parse the fake header,
    return (w, h, body-bytes). A real decoder (PIL/ffmpeg) raises
    NotImplementedError here until its library is present."""
    if payload[:8] != _MAGIC:
        raise NotImplementedError(
            "real media decoding requires an image/audio library not present "
            "in this container; only FAKEIMG1 payloads are decodable"
        )
    w = _struct.unpack(">i", payload[8:12])[0]
    h = _struct.unpack(">i", payload[12:16])[0]
    return w, h, np.frombuffer(payload[16:], dtype=np.uint8)


def extract_media_features(media: DataFrame, n_feature: int = 8) -> DataFrame:
    """media(doc_id, media_type, payload, …) → per-item features.

    mapInPandas iterator UDF: batch-vectorized numpy over the Arrow batch
    (bytes columns arrive as Python bytes; statistics per row via
    np.frombuffer — the only per-row step is the zero-copy buffer view).
    feature = first n_feature byte-histogram buckets, L2-normalized — the
    slot a real embedding model plugs into."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                w, h, body = _decode_fake(bytes(payload))
                hist = np.bincount(body % n_feature, minlength=n_feature).astype(
                    np.float64
                )
                norm = np.linalg.norm(hist)
                feat = (hist / norm if norm > 0 else hist).astype(np.float32)
                rows.append(
                    (
                        doc_id, mt, len(payload), w, h,
                        float(body.mean()) if len(body) else 0.0,
                        feat.tolist(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_type", "n_bytes", "width", "height",
                    "mean_byte", "feature",
                ],
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )
