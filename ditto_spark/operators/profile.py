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


def attribute_alignment(
    dfa: DataFrame,
    dfb: DataFrame,
    cols_a: list[str] | None = None,
    cols_b: list[str] | None = None,
    p: int = 9,
) -> DataFrame:
    """Cross-table attribute alignment (schema matching by instance
    overlap — Rahm & Bernstein, VLDB J. 2001 §4.2's instance-level
    matcher): before two heterogeneous sources can be linked, someone has
    to decide that A.c_nationkey corresponds to B.s_nationkey and that
    A.phone and B.s_name do not. This ranks column pairs by the estimated
    JACCARD OF THEIR VALUE SETS, computed from per-column HyperLogLog
    sketches (sketch.hll_registers, md5-portable) and the
    inclusion-exclusion identity |A∩B| = |A|+|B|−|A∪B|, where |A∪B| comes
    from the sketches' lossless union (per-register max).

    Output one row per (col_a, col_b): est_a, est_b, est_union (4 dp),
    est_inter = max(0, est_a+est_b−est_union), est_jaccard (6 dp;
    inclusion-exclusion on small intersections can go negative — clamped).
    Values are normalized lower(trim(cast as string)); nulls dropped.

    Scale shape: ONE scan per table (array-of-structs explode unpivots all
    profiled columns in a single pass), then every downstream row is
    sketch state — ≤ 2^p registers per column, so the pairwise union and
    all estimates run on |cols_a|·|cols_b|·2^p tiny rows no matter how
    many table rows flowed in. That is the difference between this and an
    exact distinct-join profiler, which would shuffle every distinct value
    of every column once per candidate pair. Sketch registers are plain
    md5 arithmetic, so the DuckDB oracle reproduces registers, unions,
    and estimates bit-for-bit (`attribute_alignment` query)."""
    from ditto_spark.operators.sketch import hll_estimate, hll_registers

    cols_a = list(cols_a or dfa.columns)
    cols_b = list(cols_b or dfb.columns)

    def unpivot(df: DataFrame, cols: list[str], out: str) -> DataFrame:
        arr = F.array(*[
            F.struct(
                F.lit(c).alias(out),
                F.lower(F.trim(F.col(c).cast("string"))).alias("value"),
            )
            for c in cols
        ])
        return df.select(F.explode(arr).alias("s")).select(
            F.col(f"s.{out}").alias(out), F.col("s.value").alias("value")
        )

    ra = hll_registers(unpivot(dfa, cols_a, "col_a"), "value", ["col_a"], p=p)
    rb = hll_registers(unpivot(dfb, cols_b, "col_b"), "value", ["col_b"], p=p)
    ea = hll_estimate(ra, ["col_a"], p=p).select(
        "col_a", F.col("est_distinct").alias("est_a")
    )
    eb = hll_estimate(rb, ["col_b"], p=p).select(
        "col_b", F.col("est_distinct").alias("est_b")
    )
    # the pair grid is seeded from the REQUESTED column lists as literals,
    # not from the estimate tables: a column whose normalized values are
    # all null produces no HLL registers and hence no estimate row, and a
    # grid derived from estimates would silently drop every pair involving
    # it. Literals guarantee one output row per (col_a, col_b) with
    # zero-valued estimates for the empty side.
    spark = dfa.sparkSession
    grid = (
        spark.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(c) for c in cols_a])
            ).alias("col_a")
        )
        .crossJoin(
            spark.range(1).select(
                F.explode(
                    F.array(*[F.lit(c) for c in cols_b])
                ).alias("col_b")
            )
        )
    )
    pairs = grid
    pu = (
        pairs.join(ra, "col_a").select("col_a", "col_b", "idx", "rho")
        .unionByName(
            pairs.join(rb, "col_b").select("col_a", "col_b", "idx", "rho")
        )
        .groupBy("col_a", "col_b", "idx")
        .agg(F.max("rho").alias("rho"))
    )
    eu = hll_estimate(pu, ["col_a", "col_b"], p=p).select(
        "col_a", "col_b", F.col("est_distinct").alias("est_union")
    )
    ea0 = F.coalesce(F.col("est_a"), F.lit(0.0))
    eb0 = F.coalesce(F.col("est_b"), F.lit(0.0))
    eu0 = F.coalesce(F.col("est_union"), F.lit(0.0))
    inter = F.round(F.greatest(F.lit(0.0), ea0 + eb0 - eu0), 4)

    def ratio(denom: F.Column) -> F.Column:
        return F.round(
            F.when(denom > 0, F.least(F.lit(1.0), inter / denom))
            .otherwise(F.lit(0.0)),
            6,
        )

    # containments separate FK-style INCLUSION from mutual identity: a
    # supplier-key column contained in a customer-key column scores
    # containment_b ≈ 1 while jaccard stays low — the signal that says
    # "foreign key", which symmetric jaccard alone cannot express.
    # Left joins onto the literal grid + coalesce-to-0: a pair with an
    # all-null side still gets its row (zero estimates), never a silent
    # drop.
    return (
        grid.join(eu, ["col_a", "col_b"], "left")
        .join(F.broadcast(ea), "col_a", "left")
        .join(F.broadcast(eb), "col_b", "left")
        .select(
            "col_a", "col_b",
            ea0.alias("est_a"),
            eb0.alias("est_b"),
            eu0.alias("est_union"),
            inter.alias("est_inter"),
            ratio(eu0).alias("est_jaccard"),
            ratio(ea0).alias("est_containment_a"),
            ratio(eb0).alias("est_containment_b"),
        )
    )
