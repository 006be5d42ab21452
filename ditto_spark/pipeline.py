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
    # Progressive-scoring break-even knobs (round-4 verdict #5: the skew
    # drill measured progressive 1.8x SLOWER at surrogate cost while
    # pruning 58% of pairs — the saved scorer work must exceed the
    # n_batches meta-CC/join overhead to pay). scorer_cost_per_pair:
    # sec/pair; None → measure on a calibration batch at run time.
    # progressive_batch_overhead_sec is the measured sandbox per-batch
    # fixed cost (meta-CC + two id joins, BENCH/skew_drill.json ≈ 29 s);
    # at cluster scale re-measure and override.
    scorer_cost_per_pair: float | None = None
    progressive_prune_frac: float = 0.5
    progressive_batch_overhead_sec: float = 30.0
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


def calibrate_scorer_cost(
    with_text: DataFrame,
    scorer_factory=None,
    n_sample: int = 2048,
) -> float:
    """Measured seconds/pair of the pairwise scorer on a driver-side
    calibration batch — the number the progressive break-even needs. The
    batch is collected once and the scorer callable timed directly (model
    cost, not Spark overhead); with the surrogate this is ~microseconds,
    with a real LM orders of magnitude more — which is exactly the regime
    split that decides progressive vs one-shot."""
    import time

    from ditto_spark.operators.scoring import surrogate_scorer_factory

    pdf = with_text.select("left_txt", "right_txt").limit(n_sample).toPandas()
    if pdf.empty:
        return 0.0
    scorer = (scorer_factory or surrogate_scorer_factory)()
    t0 = time.monotonic()
    scorer(pdf["left_txt"], pdf["right_txt"])
    return (time.monotonic() - t0) / len(pdf)


def progressive_break_even_cost(
    n_pairs: int,
    n_batches: int,
    prune_frac: float,
    per_batch_overhead_sec: float,
) -> float:
    """Minimum scorer cost/pair (sec) at which progressive scoring wins:
    the pruned work (prune_frac × n_pairs pairs never scored) must exceed
    the fixed per-batch overhead (meta-CC + two id-keyed joins) times
    n_batches. Below this, one-shot is faster — BENCH/skew_drill.json
    measured exactly that (progressive 262 s vs one-shot 146 s at
    surrogate cost despite 58% pruning)."""
    return (n_batches * per_batch_overhead_sec) / max(
        prune_frac * n_pairs, 1.0
    )


def dedup_transcripts_progressive(
    transcripts: DataFrame,
    cfg: PipelineConfig | None = None,
    n_batches: int = 4,
    serialized: DataFrame | None = None,
    auto: bool = False,
    scorer_factory=None,
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

    auto=True applies the measured break-even (round-4 verdict #5)
    instead of trusting the operator: the candidate count and a
    calibration-batch scorer cost (or cfg.scorer_cost_per_pair when
    pre-measured) decide between progressive and the one-shot scorer —
    both produce identical clusters, so the choice is purely a cost
    decision, and `stats["mode"]` records which ran plus the numbers
    behind the decision.

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

    if auto:
        with_text = with_text.persist()
        n_pairs = with_text.count()
        cost = cfg.scorer_cost_per_pair
        if cost is None:
            cost = calibrate_scorer_cost(with_text, scorer_factory)
        break_even = progressive_break_even_cost(
            n_pairs,
            n_batches,
            cfg.progressive_prune_frac,
            cfg.progressive_batch_overhead_sec,
        )
        decision = {
            "n_pairs": n_pairs,
            "scorer_cost_per_pair": cost,
            "break_even_cost_per_pair": break_even,
            "prune_frac_assumed": cfg.progressive_prune_frac,
            "batch_overhead_sec": cfg.progressive_batch_overhead_sec,
        }
        if cost <= break_even:
            # one-shot wins: score everything, threshold, one CC pass
            scored = score_pairs(with_text, scorer_factory)
            matches = apply_threshold(scored, cfg.tau).where(
                F.col("match") == 1
            )
            clusters = assign_clusters(
                serialized,
                matches.select("left_id", "right_id"),
                assume_unique=True,
            )
            with_text.unpersist()
            return clusters, {"mode": "one_shot", "decision": decision}
        assignments, stats = score_pairs_progressive(
            with_text,
            threshold=cfg.tau,
            scorer_factory=scorer_factory,
            n_batches=n_batches,
        )
        with_text.unpersist()
        stats = {"mode": "progressive", "decision": decision, **stats}
    else:
        assignments, stats = score_pairs_progressive(
            with_text,
            threshold=cfg.tau,
            scorer_factory=scorer_factory,
            n_batches=n_batches,
        )
        stats = {"mode": "progressive", **stats}
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
