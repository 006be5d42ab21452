"""HyperLogLog sketch: accuracy, exact mergeability, partition invariance."""

import pyspark.sql.functions as F

from ditto_spark.operators.sketch import (
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _values_df(spark, n, prefix="v", dup_factor=3):
    """n distinct strings, each repeated dup_factor times."""
    return (
        spark.range(n * dup_factor)
        .select(
            F.concat(F.lit(prefix), (F.col("id") % n).cast("string")).alias("val"),
            (F.col("id") % 2).cast("int").alias("grp"),
        )
    )


def test_hll_estimate_within_tolerance(spark):
    n = 5000
    df = _values_df(spark, n, dup_factor=2).drop("grp")
    est = hll_distinct(df, "val", p=9).collect()[0]["est_distinct"]
    # p=9 -> ~4.6% RSE; allow 3 sigma
    assert abs(est - n) / n < 0.14, est


def test_hll_small_range_linear_counting_is_near_exact(spark):
    df = _values_df(spark, 30, dup_factor=5).drop("grp")
    est = hll_distinct(df, "val", p=9).collect()[0]["est_distinct"]
    assert abs(est - 30) < 3, est


def test_hll_merge_halves_equals_whole(spark):
    df = _values_df(spark, 2000, dup_factor=1).drop("grp")
    a = df.where(F.length("val") % 2 == 0)
    b = df.where(F.length("val") % 2 == 1)
    whole = hll_estimate(hll_registers(df, "val")).collect()[0]
    merged = hll_estimate(
        hll_merge(hll_registers(a, "val"), hll_registers(b, "val"))
    ).collect()[0]
    assert merged["sum_scaled"] == whole["sum_scaled"]
    assert merged["n_registers"] == whole["n_registers"]
    assert merged["est_distinct"] == whole["est_distinct"]


def test_hll_merge_idempotent_under_replay(spark):
    df = _values_df(spark, 500, dup_factor=1).drop("grp")
    regs = hll_registers(df, "val")
    replayed = hll_merge(regs, regs, regs)
    assert (
        hll_estimate(replayed).collect()[0]["sum_scaled"]
        == hll_estimate(regs).collect()[0]["sum_scaled"]
    )


def test_hll_registers_partition_invariant(spark):
    df = _values_df(spark, 1000, dup_factor=2)
    r1 = sorted(
        hll_registers(df, "val", ["grp"]).collect(),
        key=lambda r: (r["grp"], r["idx"]),
    )
    r2 = sorted(
        hll_registers(df.repartition(17), "val", ["grp"]).collect(),
        key=lambda r: (r["grp"], r["idx"]),
    )
    assert [tuple(r) for r in r1] == [tuple(r) for r in r2]


def test_hll_nulls_ignored_and_grouped(spark):
    df = _values_df(spark, 100, dup_factor=1).withColumn(
        "val", F.when(F.col("grp") == 0, F.col("val"))
    )
    out = {r["grp"]: r for r in hll_distinct(df, "val", ["grp"]).collect()}
    assert 1 not in out  # all-null group contributes no registers
    assert abs(out[0]["est_distinct"] - 50) < 8
