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


def _check_headers(payloads: list, pdf: pd.DataFrame, hdr: int) -> None:
    """Fail a batch with a locatable error when a payload is shorter than
    the fixed header (a bare numpy reshape mismatch hides WHICH record is
    malformed)."""
    short = [i for i, p in enumerate(payloads) if len(p) < hdr]
    if short:
        i = short[0]
        raise NotImplementedError(
            f"payload shorter than the {hdr}-byte FAKE header "
            f"(doc_id={pdf['doc_id'].iloc[i]!r}, {len(payloads[i])} bytes); "
            "real media decoding requires a codec library not present in "
            "this container"
        )


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

    mapInPandas iterator UDF, fully batch-vectorized (round-2 verdict fix —
    the old version looped rows in Python): payload prefixes are stacked
    into one (B, 16) uint8 matrix for the magic check + big-endian (w, h)
    parse, bodies are concatenated into one flat uint8 array and reduced
    per-row with segment-indexed bincounts. The only remaining per-row
    Python is the byte-slice/join building those two buffers — opaque
    variable-length bytes have no columnar representation to avoid it.
    feature = first n_feature byte-histogram buckets, L2-normalized — the
    slot a real embedding model plugs into (a real decoder replaces the
    header branch via `_decode_fake`, which stays the per-row swap point).
    """
    _hdr = 16
    magic = np.frombuffer(_MAGIC, dtype=np.uint8)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "doc_id", "media_type", "n_bytes", "width", "height",
            "mean_byte", "feature",
        ]
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame({c: [] for c in cols})
                continue
            payloads = [bytes(p) for p in pdf["payload"]]
            _check_headers(payloads, pdf, _hdr)
            prefix = np.frombuffer(
                b"".join(p[:_hdr] for p in payloads), dtype=np.uint8
            ).reshape(n, _hdr)
            if not (prefix[:, :8] == magic).all():
                raise NotImplementedError(
                    "real media decoding requires an image/audio library not "
                    "present in this container; only FAKEIMG1 payloads are "
                    "decodable"
                )
            dims = (
                prefix[:, 8:_hdr].copy().view(">i4").astype(np.int32).reshape(n, 2)
            )
            lens = np.array([len(p) for p in payloads], dtype=np.int64) - _hdr
            body = np.frombuffer(
                b"".join(p[_hdr:] for p in payloads), dtype=np.uint8
            )
            row_idx = np.repeat(np.arange(n), lens)
            byte_sum = np.bincount(
                row_idx, weights=body.astype(np.float64), minlength=n
            )
            mean_byte = np.where(lens > 0, byte_sum / np.maximum(lens, 1), 0.0)
            hist = (
                np.bincount(
                    row_idx * n_feature + body % n_feature,
                    minlength=n * n_feature,
                )
                .reshape(n, n_feature)
                .astype(np.float64)
            )
            norm = np.linalg.norm(hist, axis=1, keepdims=True)
            feat = (hist / np.where(norm > 0, norm, 1.0)).astype(np.float32)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": lens + _hdr,
                    "width": dims[:, 0],
                    "height": dims[:, 1],
                    "mean_byte": mean_byte,
                    "feature": list(feat),
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


_VMAGIC = b"FAKEVID1"
_VHDR = 12  # 8-byte magic + big-endian int32 frame count
_FRAME_BYTES = 16  # one md5 digest per fake frame

VIDEO_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, n_frames int"
)


def synthesize_video(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic fake video container: payload = 8-byte magic +
    packed int32 frame count + n_frames fixed-size frames, frame i being
    the 16 raw bytes of md5(doc_id ':' i). Built entirely from JVM
    expressions (sequence → transform → array_join → unhex — no Python),
    and every byte is md5-derived so frame SLICING downstream is exactly
    oracle-checkable: the DuckDB oracle regenerates any frame's hex
    without blob functions."""
    nf = (
        F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.lit("nf|"), F.col(text_col))), 1, 8),
                16, 10,
            ).cast("bigint"),
            F.lit(32),
        )
        + 4
    ).cast("int")
    body_hex = F.array_join(
        F.transform(
            F.sequence(F.lit(0), nf - 1),
            lambda i: F.md5(F.concat_ws(":", F.col(id_col), i)),
        ),
        "",
    )
    payload = F.concat(
        F.lit(_VMAGIC),
        F.unhex(F.format_string("%08x", nf)),
        F.unhex(body_hex),
    )
    return docs.select(
        F.col(id_col),
        F.lit("video").alias("media_type"),
        payload.alias("payload"),
        nf.alias("n_frames"),
    )


def sample_frames(
    videos: DataFrame, n_sample: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Uniform temporal frame sampling from an opaque fixed-frame-size
    video container — (doc_id, payload, n_frames) → one row per sampled
    frame with the frame bytes sliced out of the payload.

    m = min(n_sample, n_frames) frames per video at indices
    floor(j * n_frames / m), j = 0..m-1 (evenly spaced, first frame always
    included). The slice is a pure JVM expression (posexplode of a
    sequence + binary substring): no Python anywhere, whole-stage codegen
    end to end, and the only wide operation is whatever the caller does
    next — frame extraction itself is embarrassingly parallel. A real
    codec (ffmpeg keyframe extraction) replaces the fixed-stride substring
    with a mapInPandas decode, same output contract.

    Output: (doc_id, n_frames, sample_idx, frame_idx, frame binary,
    frame_hex) — frame_hex = lower(hex(frame)) so engines without blob
    slicing can verify the slice byte-for-byte.
    """
    if n_sample < 1:
        raise ValueError(f"n_sample must be >= 1, got {n_sample}")
    # A zero/negative-frame container contributes no rows. Without this
    # filter m=0 would divide-by-zero in frame_idx (ANSI mode fails the
    # whole job on one malformed record) and sequence(0, -1) is NOT empty
    # (Spark auto-negative-step yields [0, -1]).
    videos = videos.where(F.col("n_frames") > 0)
    m = F.least(F.lit(n_sample), F.col("n_frames"))
    exploded = videos.select(
        F.col(id_col),
        "n_frames",
        "payload",
        F.posexplode(F.sequence(F.lit(0), m - 1)).alias("sample_idx", "_j"),
    )
    frame_idx = ((F.col("_j") * F.col("n_frames")) / m).cast("int")
    frame = F.substring(
        F.col("payload"), F.lit(_VHDR) + frame_idx * _FRAME_BYTES + 1, _FRAME_BYTES
    )
    return exploded.select(
        F.col(id_col),
        "n_frames",
        "sample_idx",
        frame_idx.alias("frame_idx"),
        frame.alias("frame"),
        F.lower(F.hex(frame)).alias("frame_hex"),
    )


def resize_media(
    media: DataFrame, target_w: int, target_h: int
) -> DataFrame:
    """Nearest-neighbor media resize as an Arrow-batched mapInPandas UDF —
    the standard image-preprocessing step before feature extraction.
    Operating on the fake codec: the body is treated as the flat pixel
    pool and resampled to target_w*target_h bytes at source index
    floor((i + 0.5) * len / T); the output payload is a well-formed
    FAKEIMG1 container with the new dimensions. Fully batch-vectorized:
    one stacked prefix matrix for headers, one flat gather with per-row
    offsets for the resample — no per-row Python beyond the unavoidable
    variable-length byte split/join. A real resizer (PIL.Image.resize /
    libvips) replaces the gather, same contract.
    """
    if target_w < 1 or target_h < 1:
        raise ValueError("target dims must be >= 1")
    _hdr = 16
    magic = np.frombuffer(_MAGIC, dtype=np.uint8)
    T = target_w * target_h
    new_header = _MAGIC + _struct.pack(">ii", target_w, target_h)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "media_type", "payload", "width", "height"]
        grid = (np.arange(T, dtype=np.float64) + 0.5) / T
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame({c: [] for c in cols})
                continue
            payloads = [bytes(p) for p in pdf["payload"]]
            _check_headers(payloads, pdf, _hdr)
            prefix = np.frombuffer(
                b"".join(p[:_hdr] for p in payloads), dtype=np.uint8
            ).reshape(n, _hdr)
            if not (prefix[:, :8] == magic).all():
                raise NotImplementedError(
                    "real media decoding requires an image/audio library not "
                    "present in this container; only FAKEIMG1 payloads are "
                    "decodable"
                )
            lens = np.array([len(p) for p in payloads], dtype=np.int64) - _hdr
            if (lens < 1).any():
                raise ValueError("empty media body cannot be resized")
            body = np.frombuffer(
                b"".join(p[_hdr:] for p in payloads), dtype=np.uint8
            )
            offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
            # (n, T) source indices: per-row nearest-neighbor into the pool
            idx = (grid[None, :] * lens[:, None]).astype(np.int64)
            flat = body[(offsets[:, None] + idx).ravel()].reshape(n, T)
            out = [new_header + row.tobytes() for row in flat]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "payload": out,
                    "width": target_w,
                    "height": target_h,
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        run, schema=MEDIA_SCHEMA
    )
