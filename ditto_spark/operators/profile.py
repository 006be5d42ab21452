"""Column profiling for linkage-model design (Splink's
`profile_columns` counterpart — null rates, cardinality, and top-value
concentration are what decide which attributes make good blocking keys and
which comparisons need term-frequency adjustment; cf. the TF-adjusted
scoring in `operators/fellegi.py`).

Shape: the wide frame unpivots to (attr, value) via `stack` — one narrow
projection, no Python — then a single (attr, value) count aggregation feeds
every statistic:

  n_rows / n_null        from count-splitting the same agg (no second scan)
  n_distinct             count over the (attr, value) groups
  avg_len                weighted by group count
  top_value / top_count  ranking window over the per-attr value counts

The (attr, value) groupBy is map-side partial-aggregated, so a hot value
(e.g. 90% null-like placeholder) collapses per-partition before the
shuffle; the ranking window's per-attr partitions hold |distinct values of
that attr| rows, already aggregated — at 10^12 rows the exchange carries
distinct values, not rows. For attributes whose distinct count itself is
corpus-sized (free text), profile on a fingerprint or use
`sketch.hll_distinct` — the exact path here is deliberate: profiling runs
once per linkage-model design session, and tie-broken top values must be
deterministic (ties -> smallest value) to be oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per attribute: n_rows, n_null, null_frac (4 dp), n_distinct
    (non-null), avg_len (4 dp, non-null string length), top_value,
    top_count (most frequent non-null value; ties -> smallest value)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    stack_args = ", ".join(f"'{c}', cast(`{c}` as string)" for c in cols)
    long = df.selectExpr(f"stack({len(cols)}, {stack_args}) as (attr, value)")
    counts = long.groupBy("attr", "value").agg(F.count(F.lit(1)).alias("cnt"))
    per_attr = counts.groupBy("attr").agg(
        F.sum("cnt").alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), F.col("cnt")).otherwise(F.lit(0))).alias(
            "n_null"
        ),
        F.count(F.when(F.col("value").isNotNull(), F.lit(1))).alias("n_distinct"),
        (
            F.sum(F.when(F.col("value").isNotNull(), F.length("value") * F.col("cnt")))
            / F.sum(F.when(F.col("value").isNotNull(), F.col("cnt")))
        ).alias("avg_len_raw"),
    )
    w = Window.partitionBy("attr").orderBy(F.desc("cnt"), F.asc("value"))
    top = (
        counts.where(F.col("value").isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("attr", F.col("value").alias("top_value"), F.col("cnt").alias("top_count"))
    )
    return (
        per_attr.join(top, "attr", "left")
        .select(
            "attr",
            "n_rows",
            "n_null",
            F.round(F.col("n_null") / F.col("n_rows"), 4).alias("null_frac"),
            "n_distinct",
            F.round("avg_len_raw", 4).alias("avg_len"),
            "top_value",
            "top_count",
        )
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Exact distributed quantiles (percentile_disc / type-1 semantics: the
    value at 1-based rank ceil(p*n)) without a single-partition global sort
    — `approx_percentile` is estimation and engine-specific, and a plain
    `ORDER BY` window funnels the corpus through one task. Built on
    `blocking.global_rank` (range-repartition + per-partition offsets from
    a tiny count collect + zero-exchange local positions); the quantile
    lookup is then a broadcast semi-join of |probs| target ranks against
    the ranked table. Null values are excluded (SQL percentile semantics).

    `tie_cols` must make (value_col, *tie_cols) a total order so ranks are
    deterministic. Output: (prob double, value) one row per prob, sorted
    by prob.
    """
    from ditto_spark.operators.blocking import global_rank

    if not probs:
        raise ValueError("probs must be non-empty")
    if any(not 0.0 < p <= 1.0 for p in probs):
        raise ValueError(f"probs must be in (0, 1], got {probs}")
    import math

    tie_cols = list(tie_cols or [])
    vals = df.where(F.col(value_col).isNotNull())
    n = vals.count()
    if n == 0:
        raise ValueError("exact_quantiles: no non-null values")
    ranked = global_rank(vals, [value_col] + tie_cols, out_col="__rank")
    spark = df.sparkSession
    targets = spark.createDataFrame(
        [(float(p), max(int(math.ceil(p * n)) - 1, 0)) for p in sorted(set(probs))],
        "prob double, __rank long",
    )
    return (
        ranked.join(F.broadcast(targets), "__rank")
        .select("prob", F.col(value_col).alias("value"))
        .orderBy("prob")
    )
