"""End-to-end record-linkage pipeline (SURVEY.md §3.1 Spark rebuild):

transcripts → serialize → MinHash-LSH blocking → pairwise scorer (Arrow UDF
or JVM surrogate) → strict p > τ → large-star/small-star connected
components → clusters.

Exactly three keyed shuffles at scale: groupBy(conv_id) for serialization,
the band equi-join for blocking, and the CC iterations (bounded O(log n)
rounds). The scorer stage is shuffle-free (mapInPandas over the already
partitioned pair table); `repartition_pairs` controls its parallelism so no
partition exceeds model memory (SURVEY.md §7 risk: skew).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from ditto_spark.operators.serialize import serialize_conversations
from ditto_spark.operators.blocking import block_minhash_lsh
from ditto_spark.operators.scoring import (
    attach_pair_text,
    score_pairs,
    score_pairs_builtin,
    apply_threshold,
)
from ditto_spark.operators.cluster import assign_clusters


@dataclass
class PipelineConfig:
    # b=21 bands × r=3 rows: candidate prob 1-(1-s³)²¹ ≈ 0.98 at Jaccard 0.55
    # (noisy duplicate variants) while staying ~0 below 0.15 — recall-oriented,
    # precision restored by the scorer + threshold downstream.
    shingle_n: int = 2
    num_perm: int = 64
    num_bands: int = 21
    rows_per_band: int = 3
    max_bucket: int = 200
    lsh_prefilter: float | None = 0.15  # est_jaccard floor before scoring
    tau: float = 0.5
    use_arrow_udf_scorer: bool = True
    repartition_pairs: int | None = None
    extra: dict = field(default_factory=dict)


@dataclass
class PipelineResult:
    serialized: DataFrame
    candidates: DataFrame
    scored: DataFrame
    matches: DataFrame
    clusters: DataFrame


def tune_threshold_on_pairs(
    serialized: DataFrame,
    labeled_pairs: DataFrame,
    cfg: PipelineConfig | None = None,
    verify: bool = True,
) -> float:
    """M4 validation flow (matcher.py:192-253 / ditto.py:98-109): score the
    labeled validation pairs with the SAME scorer the pipeline uses, sweep
    the τ grid distributed, return argmax-F1 τ (ties → lowest τ).

    verify=True replicates the reference's predict-then-verify loop
    (matcher.py:229-252): the scorer re-runs from scratch at the chosen τ
    and the achieved F1 must reproduce the sweep's claim — guarding against
    a nondeterministic scorer."""
    from ditto_spark.operators.evaluate import tune_threshold, tune_threshold_verified

    cfg = cfg or PipelineConfig()

    def score_fresh() -> DataFrame:
        with_text = attach_pair_text(
            labeled_pairs.select("left_id", "right_id"), serialized
        )
        scored = (
            score_pairs(with_text) if cfg.use_arrow_udf_scorer
            else score_pairs_builtin(with_text)
        )
        return scored.join(
            labeled_pairs.select("left_id", "right_id", "label"),
            ["left_id", "right_id"],
        )

    if verify:
        tau, _, _ = tune_threshold_verified(score_fresh(), score_fresh)
        return tau
    return tune_threshold(score_fresh())


def dedup_transcripts_tuned(
    transcripts: DataFrame,
    labeled_pairs: DataFrame,
    cfg: PipelineConfig | None = None,
) -> tuple["PipelineResult", float]:
    """Full reference inference flow: tune τ on labeled validation pairs,
    then run the pipeline at the tuned τ."""
    from dataclasses import replace

    cfg = cfg or PipelineConfig()
    serialized = serialize_conversations(transcripts).persist()
    tau = tune_threshold_on_pairs(serialized, labeled_pairs, cfg)
    # thread the already-persisted serialization into the pipeline run — a
    # second serialize pass (plus a second cached copy) is pure waste
    res = dedup_transcripts(transcripts, replace(cfg, tau=tau), serialized=serialized)
    return res, tau


def dedup_transcripts_progressive(
    transcripts: DataFrame,
    cfg: PipelineConfig | None = None,
    n_batches: int = 4,
    serialized: DataFrame | None = None,
) -> tuple[DataFrame, dict]:
    """Flagship variant with progressive (pay-as-you-go) scoring: candidate
    pairs run through the Arrow scorer in descending est_jaccard batches and
    pairs whose endpoints already share a cluster are pruned unscored
    (`scoring.score_pairs_progressive` — cluster output provably identical
    to the one-shot pipeline, tested in test_scoring/test_pipeline).

    Use when the scorer dominates (at the 50x stress point the score stage
    is 355 s of 409 s): duplicate-heavy corpora resolve near-clique groups
    from their first accepted spanning edges and the remaining clique pairs
    — the quadratic part — never reach the model. Trades n_batches extra
    edge-sized meta-CC rounds + two id joins per batch for the saved LM
    invocations; keep the one-shot path when pair probabilities for EVERY
    candidate are themselves a deliverable (auditing, calibration).

    Returns (clusters, stats) — clusters schema identical to
    PipelineResult.clusters; stats has per-batch scored/pruned counts.
    """
    from ditto_spark.operators.scoring import score_pairs_progressive

    cfg = cfg or PipelineConfig()
    if serialized is None:
        serialized = serialize_conversations(transcripts).persist()
    candidates = block_minhash_lsh(
        serialized,
        text_col="block_text",
        shingle_n=cfg.shingle_n,
        num_perm=cfg.num_perm,
        num_bands=cfg.num_bands,
        rows_per_band=cfg.rows_per_band,
        max_bucket=cfg.max_bucket,
        threshold=cfg.lsh_prefilter,
    )
    with_text = attach_pair_text(candidates, serialized)
    n_parts = cfg.repartition_pairs or 2 * int(
        transcripts.sparkSession.sparkContext.defaultParallelism
    )
    with_text = with_text.repartition(n_parts)
    assignments, stats = score_pairs_progressive(
        with_text, threshold=cfg.tau, n_batches=n_batches
    )
    clusters = (
        serialized.select("conv_id")
        .distinct()
        .join(assignments, "conv_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "conv_id"))
    )
    return clusters, stats


def dedup_transcripts(
    transcripts: DataFrame,
    cfg: PipelineConfig | None = None,
    serialized: DataFrame | None = None,
) -> PipelineResult:
    cfg = cfg or PipelineConfig()
    # serialized feeds blocking, both sides of attach_pair_text, and the
    # final cluster assignment — materialize once (checkpoint table at scale)
    if serialized is None:
        serialized = serialize_conversations(transcripts).persist()
    candidates = block_minhash_lsh(
        serialized,
        text_col="block_text",
        shingle_n=cfg.shingle_n,
        num_perm=cfg.num_perm,
        num_bands=cfg.num_bands,
        rows_per_band=cfg.rows_per_band,
        max_bucket=cfg.max_bucket,
        threshold=cfg.lsh_prefilter,
    )
    with_text = attach_pair_text(candidates, serialized)
    # Repartition before the Python scorer: AQE coalesces the pair table to
    # ~64MB partitions, which strands the Arrow UDF on a handful of Python
    # workers (measured: local[32] SLOWER than local[8] at sf0.1). The UDF
    # stage is CPU-bound per pair, not bytes-bound — spread it over the
    # cluster's cores. On a real cluster this is also where pair-count-based
    # sizing caps model memory per partition (SURVEY.md §7).
    n_parts = cfg.repartition_pairs or 2 * int(
        transcripts.sparkSession.sparkContext.defaultParallelism
    )
    if cfg.use_arrow_udf_scorer:
        with_text = with_text.repartition(n_parts)
    if cfg.use_arrow_udf_scorer:
        scored = score_pairs(with_text)
    else:
        scored = score_pairs_builtin(with_text)
    decided = apply_threshold(scored, cfg.tau)
    matches = decided.where(F.col("match") == 1)
    # candidates are distinct (left < right) by construction → the CC init
    # can skip its dedup shuffle over the full edge set
    clusters = assign_clusters(
        serialized, matches.select("left_id", "right_id"), assume_unique=True
    )
    return PipelineResult(serialized, candidates, scored, matches, clusters)
