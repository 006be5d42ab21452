"""A1/A2 + M4 — evaluation: confusion-matrix F1 and threshold sweep.

Reference semantics:
  * pairwise F1 from confusion counts — /root/reference/f1.py:9-19
    (tp/fp/fn loop; f1 = 2tp / (2tp + fp + fn)).
  * threshold sweep — /root/reference/ditto_light/ditto.py:98-109:
    τ ∈ {0.0, 0.05, …, 0.95}, strict `prob > τ`, argmax F1 on validation.

Spark-first: one groupBy for the confusion matrix; the sweep is a broadcast
crossJoin against a 20-row threshold grid followed by the same agg — the
probs never leave the cluster (the reference collects to numpy;
at 10^12 scale that's not an option).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def confusion_f1(scored_with_labels: DataFrame, pred_col: str = "match", label_col: str = "label") -> DataFrame:
    """(…, match, label) → single row (tp, fp, fn, tn, precision, recall, f1)."""
    agg = scored_with_labels.agg(
        F.sum(((F.col(pred_col) == 1) & (F.col(label_col) == 1)).cast("long")).alias("tp"),
        F.sum(((F.col(pred_col) == 1) & (F.col(label_col) == 0)).cast("long")).alias("fp"),
        F.sum(((F.col(pred_col) == 0) & (F.col(label_col) == 1)).cast("long")).alias("fn"),
        F.sum(((F.col(pred_col) == 0) & (F.col(label_col) == 0)).cast("long")).alias("tn"),
    )
    return agg.select(
        "tp", "fp", "fn", "tn",
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))).alias("precision"),
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))).alias("recall"),
        (
            2.0 * F.col("tp")
            / F.greatest(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1))
        ).alias("f1"),
    )


def threshold_grid_f1(
    scored_with_labels: DataFrame,
    prob_col: str = "prob",
    label_col: str = "label",
    grid_start: float = 0.0,
    grid_stop: float = 0.95,
    grid_step: float = 0.05,
) -> DataFrame:
    """Per-threshold F1 over the ditto grid (strict prob > τ).

    crossJoin with the tiny grid is broadcast by Catalyst; the agg is a
    single shuffle keyed by τ (20 keys)."""
    spark = scored_with_labels.sparkSession
    n = int(round((grid_stop - grid_start) / grid_step)) + 1
    grid = spark.range(n).select(
        # round: float accumulation otherwise yields e.g. 0.9500000000000001
        F.round(F.lit(grid_start) + F.col("id") * grid_step, 6).alias("tau")
    )
    crossed = scored_with_labels.crossJoin(F.broadcast(grid))
    pred = (F.col(prob_col) > F.col("tau")).cast("int")
    per_tau = crossed.groupBy("tau").agg(
        F.sum(((pred == 1) & (F.col(label_col) == 1)).cast("long")).alias("tp"),
        F.sum(((pred == 1) & (F.col(label_col) == 0)).cast("long")).alias("fp"),
        F.sum(((pred == 0) & (F.col(label_col) == 1)).cast("long")).alias("fn"),
    )
    return per_tau.select(
        "tau", "tp", "fp", "fn",
        (
            2.0 * F.col("tp")
            / F.greatest(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1))
        ).alias("f1"),
    )


def tune_threshold(scored_with_labels: DataFrame, **grid_kwargs) -> float:
    """argmax-F1 τ on validation probs (ditto.py:98-109; ties → lowest τ,
    matching the reference's `>` update)."""
    best = (
        threshold_grid_f1(scored_with_labels, **grid_kwargs)
        .orderBy(F.desc("f1"), F.asc("tau"))
        .limit(1)
        .collect()[0]
    )
    return float(best["tau"])


def cluster_pairwise_f1(predicted: DataFrame, truth: DataFrame) -> DataFrame:
    """Cluster-level metric: precision/recall/F1 over implied within-cluster
    pairs. predicted/truth: (conv_id, cluster_id). Pairs are implied
    (left < right within a cluster); computed with two self-joins + anti
    joins, all DataFrame-side."""
    def implied(df: DataFrame) -> DataFrame:
        return (
            df.alias("a")
            .join(df.alias("b"), F.col("a.cluster_id") == F.col("b.cluster_id"))
            .where(F.col("a.conv_id") < F.col("b.conv_id"))
            .select(
                F.col("a.conv_id").alias("left_id"),
                F.col("b.conv_id").alias("right_id"),
            )
        )

    p = implied(predicted)
    t = implied(truth)
    tp = p.join(t, ["left_id", "right_id"], "left_semi").count()
    fp = p.join(t, ["left_id", "right_id"], "left_anti").count()
    fn = t.join(p, ["left_id", "right_id"], "left_anti").count()
    spark = predicted.sparkSession
    f1 = 2.0 * tp / max(2 * tp + fp + fn, 1)
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return spark.createDataFrame(
        [(tp, fp, fn, prec, rec, f1)],
        "tp long, fp long, fn long, precision double, recall double, f1 double",
    )
