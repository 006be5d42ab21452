"""Similarity search over embedding columns (training-data-pipeline
extension; the reference's dense blocking — /root/reference/blocking/
blocker.py:43-80 — is the same problem single-node: L2-normalized matrix,
blocked matmul, threshold or top-k selection).

Two tiers, same output contract (query_id, neighbor_id, cos, rk):

* brute-force — exact baseline: crossJoin + JVM higher-order-function dot
  product + ranking window. O(|Q|·|N|); correct at any scale where |Q| is
  small or as the verify step. DuckDB-oracle-checked.

* random-hyperplane LSH — the scale path: sign-bit signature of the dot
  product against `n_planes` seeded hyperplanes (bit i = 1 iff v·r_i > 0),
  banded equi-join like MinHash/SimHash, cosine verified on candidates
  only. Hyperplanes are generated deterministically from the seed, identical
  on driver and executors; the projection is a vectorized pandas UDF (Arrow
  batches → one numpy matmul per batch — the blocked_matmul of the
  reference, inverted: planes are the small side).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "v",
    query_id_col: str = "query_id",
    query_vec_col: str = "qv",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self excluded by id).
    blocker.py:67-72's argpartition top-k re-expressed as a ranking window."""
    joined = queries.crossJoin(vectors).where(
        F.col(id_col) != F.col(query_id_col)
    )
    cos = _dot(F.col(query_vec_col), F.col(vec_col)) / (
        F.sqrt(_dot(F.col(query_vec_col), F.col(query_vec_col)))
        * F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        joined.select(query_id_col, F.col(id_col).alias("neighbor_id"), cos.alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def hyperplane_signatures(
    vectors: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    seed: int = 23,
) -> DataFrame:
    """(id, vec) → (id, hsig: bigint) sign-bit signature. One numpy matmul
    per Arrow batch (vectorized; no per-row Python)."""
    rng = np.random.RandomState(seed)
    planes = rng.randn(dim, n_planes)

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"id": [], "hsig": []})
                continue
            m = np.stack(pdf[vec_col].to_numpy())  # (B, dim)
            bits = (m @ planes) > 0  # (B, n_planes)
            sig = (bits.astype(np.int64) << np.arange(n_planes, dtype=np.int64)).sum(axis=1)
            yield pd.DataFrame({"id": pdf[id_col].to_numpy(), "hsig": sig})

    out = vectors.select(id_col, vec_col).mapInPandas(
        project, schema=f"id {vectors.schema[id_col].dataType.simpleString()}, hsig long"
    )
    return out.withColumnRenamed("id", id_col)


def cosine_topk_lsh(
    vectors: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 23,
    query_filter: F.Column | None = None,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH banding → candidate equi-join →
    exact cosine on candidates → ranking window. Recall tunable via
    n_planes/bands; candidates ≪ n² (the 100 TB path — the brute-force
    crossJoin is the verify/baseline)."""
    assert n_planes % bands == 0
    width = n_planes // bands
    mask = (1 << width) - 1
    sig = hyperplane_signatures(vectors, dim, id_col, vec_col, n_planes, seed)
    v = vectors.select(
        F.col(id_col),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    ).join(sig, id_col)

    chunks = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.shiftright(F.col("hsig"), b * width)
                    .bitwiseAND(F.lit(mask).cast("long"))
                    .alias("chunk"),
                )
                for b in range(bands)
            ]
        )
    )
    banded = v.select(id_col, "v", chunks.alias("c")).select(
        id_col, "v", F.col("c.band_idx").alias("band_idx"), F.col("c.chunk").alias("chunk")
    )
    q = banded.select(
        "band_idx", "chunk",
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"),
    )
    if query_filter is not None:
        q = q.where(query_filter)
    n = banded.select(
        "band_idx", "chunk",
        F.col(id_col).alias("neighbor_id"), F.col("v").alias("nv"),
    )
    cand = (
        q.join(n, ["band_idx", "chunk"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "nv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    cos = _dot(F.col("qv"), F.col("nv")) / (
        F.sqrt(_dot(F.col("qv"), F.col("qv"))) * F.sqrt(_dot(F.col("nv"), F.col("nv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", cos.alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 23,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cos ≥ threshold), LSH-bucketed
    (blocker.py:74-79's threshold variant at scale)."""
    assert n_planes % bands == 0
    width = n_planes // bands
    mask = (1 << width) - 1
    sig = hyperplane_signatures(vectors, dim, id_col, vec_col, n_planes, seed)
    v = vectors.select(
        F.col(id_col),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    ).join(sig, id_col)
    chunks = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.shiftright(F.col("hsig"), b * width)
                    .bitwiseAND(F.lit(mask).cast("long"))
                    .alias("chunk"),
                )
                for b in range(bands)
            ]
        )
    )
    banded = v.select(id_col, "v", chunks.alias("c")).select(
        id_col, "v", F.col("c.band_idx").alias("band_idx"), F.col("c.chunk").alias("chunk")
    )
    l = banded.select("band_idx", "chunk", F.col(id_col).alias("left_id"), F.col("v").alias("lv"))
    r = banded.select("band_idx", "chunk", F.col(id_col).alias("right_id"), F.col("v").alias("rv"))
    cand = (
        l.join(r, ["band_idx", "chunk"])
        .where(F.col("left_id") < F.col("right_id"))
        .dropDuplicates(["left_id", "right_id"])
    )
    cos = _dot(F.col("lv"), F.col("rv")) / (
        F.sqrt(_dot(F.col("lv"), F.col("lv"))) * F.sqrt(_dot(F.col("rv"), F.col("rv")))
    )
    return cand.select("left_id", "right_id", cos.alias("cos")).where(
        F.col("cos") >= threshold
    )
