"""Structured Streaming — incremental dedup/linkage ingestion.

The reference is batch-only (loose files; no streaming exists — SURVEY.md
§2.7), but a production transcript pipeline receives conversations
continuously. Two streaming operators re-use the exact batch operator
expressions (the blocking projections are narrow, so they are
streaming-legal without modification):

* exact first-seen dedup — fingerprint (md5 of normalized text) +
  `dropDuplicates` state, bounded by a watermark on the event-time column.
* incremental LSH candidate generation — each arriving serialized
  conversation computes its MinHash signature + band keys (narrow
  projections from ditto_spark.operators.blocking) and equi-joins the
  *static* band index of the already-ingested corpus (stream-static inner
  join, supported without watermark) → candidate pairs against the corpus,
  with est_jaccard from the carried signatures.

Both run with `trigger(availableNow=True)` in tests (file source → memory
sink); on a cluster the same code points at Kafka/Iceberg-CDC sources and
an Iceberg sink with checkpointLocation for exactly-once resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from ditto_spark.operators.blocking import (
    tokenize,
    shingle,
    minhash_signatures,
    lsh_bands,
)


def fingerprint_expr(text_col: str = "entity_text") -> F.Column:
    """Exact-dup fingerprint: md5 of the whitespace-normalized lowercase
    text (stable across engines)."""
    return F.md5(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))


def streaming_exact_dedup(
    stream: DataFrame,
    ts_col: str = "ts",
    text_col: str = "entity_text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-seen exact dedup on a stream: one surviving row per
    fingerprint; state bounded by the watermark."""
    return (
        stream.withColumn("fingerprint", fingerprint_expr(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicates(["fingerprint"])
    )


def build_band_index(
    corpus: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "entity_text",
    shingle_n: int = 2,
    num_perm: int = 64,
    num_bands: int = 21,
    rows_per_band: int = 3,
) -> DataFrame:
    """Static side for incremental blocking: (band_idx, band_key, corpus_id,
    corpus_sig). Persist (Iceberg table at scale); rebuilt offline as the
    corpus grows."""
    sig = minhash_signatures(
        shingle(tokenize(corpus, text_col), shingle_n), id_col, num_perm=num_perm
    )
    bands = lsh_bands(sig, id_col, num_bands, rows_per_band)
    return bands.join(sig, id_col).select(
        "band_idx", "band_key",
        F.col(id_col).alias("corpus_id"), F.col("sig").alias("corpus_sig"),
    )


def streaming_lsh_candidates(
    stream: DataFrame,
    band_index: DataFrame,
    id_col: str = "conv_id",
    text_col: str = "entity_text",
    shingle_n: int = 2,
    num_perm: int = 64,
    num_bands: int = 21,
    rows_per_band: int = 3,
    threshold: float | None = None,
) -> DataFrame:
    """Arriving entity → band keys → stream-static equi-join against the
    corpus band index → (stream_id, corpus_id, est_jaccard), deduped per
    micro-batch via groupBy max-agree (streaming-legal aggregation-free
    form: dropDuplicates on the pair key)."""
    sig = minhash_signatures(
        shingle(tokenize(stream, text_col), shingle_n), id_col, num_perm=num_perm
    )
    bands = lsh_bands(sig, id_col, num_bands, rows_per_band).join(sig, id_col)
    joined = bands.join(band_index, ["band_idx", "band_key"]).where(
        F.col(id_col) != F.col("corpus_id")
    )
    agree = F.aggregate(
        F.zip_with("sig", "corpus_sig", lambda a, b: (a == b).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    out = joined.select(
        F.col(id_col).alias("stream_id"),
        F.col("corpus_id"),
        (agree / F.size("sig")).alias("est_jaccard"),
    ).dropDuplicates(["stream_id", "corpus_id"])
    if threshold is not None:
        out = out.where(F.col("est_jaccard") >= threshold)
    return out
