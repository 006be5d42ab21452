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


# --- count-min sketch ---

from ditto_spark.operators.sketch import (  # noqa: E402
    cms_counters,
    cms_estimate,
    cms_heavy_hitters,
    cms_merge,
)


def _zipf_df(spark, n_keys=200, w=None):
    """Skewed key stream: key k appears (n_keys - k) times -> key '0' is
    the heaviest. Deterministic, no randomness."""
    return (
        spark.range(n_keys)
        .select(
            F.explode(
                F.sequence(F.lit(1), (F.lit(n_keys) - F.col("id")).cast("int"))
            ).alias("_"),
            F.concat(F.lit("k"), F.col("id").cast("string")).alias("key"),
        )
        .select("key")
    )


def test_cms_never_undercounts(spark):
    df = _zipf_df(spark, n_keys=200)
    true = {r["key"]: r["c"] for r in df.groupBy("key").agg(F.count("*").alias("c")).collect()}
    probes = df.distinct()
    est = {
        r["key"]: r["est"]
        for r in cms_estimate(cms_counters(df, "key", d=4, w=256), probes, "key", d=4, w=256).collect()
    }
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true), "CMS undercounted"


def test_cms_heavy_hitters_catches_all_true_hitters(spark):
    df = _zipf_df(spark, n_keys=200)
    t = 150
    true_heavy = {
        r["key"]
        for r in df.groupBy("key").agg(F.count("*").alias("c")).where(F.col("c") >= t).collect()
    }
    got = {r["key"] for r in cms_heavy_hitters(df, "key", threshold=t, d=4, w=1024).collect()}
    assert true_heavy <= got  # one-sided: no false negatives ever
    # sized at d=4/w=1024 for 200 keys, false positives should be rare
    assert len(got) <= len(true_heavy) + 5


def test_cms_merge_halves_equals_whole(spark):
    df = _zipf_df(spark, n_keys=100)
    a = df.where(F.substring("key", 2, 10).cast("int") % 2 == 0)
    b = df.where(F.substring("key", 2, 10).cast("int") % 2 == 1)
    merged = cms_merge(cms_counters(a, "key"), cms_counters(b, "key"))
    whole = cms_counters(df, "key")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_cms_counters_partition_invariant_and_bounded(spark):
    df = _zipf_df(spark, n_keys=150)
    d, w = 3, 64
    c1 = sorted(map(tuple, cms_counters(df, "key", d=d, w=w).collect()))
    c2 = sorted(map(tuple, cms_counters(df.repartition(13), "key", d=d, w=w).collect()))
    assert c1 == c2
    assert len(c1) <= d * w  # state bound independent of input rows


def test_cms_weighted_matches_exploded(spark):
    df = _zipf_df(spark, n_keys=80)
    pre = df.groupBy("key").agg(F.count("*").alias("cnt"))
    weighted = cms_counters(pre, "key", weight_col="cnt")
    plain = cms_counters(df, "key")
    assert sorted(map(tuple, weighted.collect())) == sorted(map(tuple, plain.collect()))


def test_salt_factors_plan(spark):
    from ditto_spark.operators.sketch import salt_factors

    est = spark.createDataFrame(
        [("k_hot", 5000), ("k_edge", 2000), ("k_cold", 1999), ("k_tiny", 3)],
        "key string, est long",
    )
    got = {r["key"]: r["n_salts"] for r in salt_factors(est, 2000, "key").collect()}
    # ceil(5000/2000)=3; exactly-at-cap and below-cap keys are omitted
    assert got == {"k_hot": 3}


def test_cms_join_size_upper_bounds_and_tightness(spark):
    from ditto_spark.operators.sketch import cms_join_size

    a = _zipf_df(spark, n_keys=60)            # key k: 60-k copies
    b = _zipf_df(spark, n_keys=30)            # shared keys k0..k29
    true = (
        a.groupBy("key").count().withColumnRenamed("count", "ca")
        .join(b.groupBy("key").count().withColumnRenamed("count", "cb"), "key")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("t"))
        .collect()[0]["t"]
    )
    est = cms_join_size(
        cms_counters(a, "key", d=4, w=2048), cms_counters(b, "key", d=4, w=2048), d=4
    ).collect()[0]["est_join_size"]
    assert est >= true
    assert est <= true * 1.2  # 60+30 keys in 2048 buckets: near-exact


def test_cms_join_size_disjoint_is_zero(spark):
    from ditto_spark.operators.sketch import cms_join_size

    a = _zipf_df(spark, n_keys=20)
    b = a.select(F.concat(F.lit("other_"), F.col("key")).alias("key"))
    est = cms_join_size(
        cms_counters(a, "key", d=4, w=4096), cms_counters(b, "key", d=4, w=4096), d=4
    ).collect()[0]["est_join_size"]
    assert est == 0  # big w -> some row collision-free -> min hits 0


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    from ditto_spark.operators.sketch import (
        bloom_dense_vector,
        bloom_might_contain_expr,
        bloom_words,
    )

    df = _values_df(spark, 500, dup_factor=1).drop("grp")
    words = bloom_dense_vector(bloom_words(df, "val", m_words=64, k=5), 64)
    hits = df.select(
        bloom_might_contain_expr(F.col("val"), words, k=5).alias("m")
    ).collect()
    assert all(r["m"] for r in hits)  # every inserted value must pass


def test_bloom_false_positive_rate_bounded(spark):
    from ditto_spark.operators.sketch import (
        bloom_dense_vector,
        bloom_might_contain_expr,
        bloom_words,
    )

    n, m_words, k = 1000, 256, 5
    inserted = _values_df(spark, n, dup_factor=1).drop("grp")
    words = bloom_dense_vector(
        bloom_words(inserted, "val", m_words=m_words, k=k), m_words
    )
    absent = _values_df(spark, 2000, prefix="absent", dup_factor=1).drop("grp")
    fp = (
        absent.select(
            bloom_might_contain_expr(F.col("val"), words, k=k).alias("m")
        )
        .where("m")
        .count()
    )
    # theoretical rate (1 - e^{-kn/m})^k ~ 0.9% at these sizes; allow 4x
    assert fp / 2000 < 0.04, fp


def test_bloom_merge_halves_equals_whole(spark):
    from ditto_spark.operators.sketch import bloom_dense_vector, bloom_words

    df = _values_df(spark, 800, dup_factor=1).drop("grp")
    a = df.where(F.length("val") % 2 == 0)
    b = df.where(F.length("val") % 2 == 1)
    whole = bloom_dense_vector(bloom_words(df, "val", m_words=64), 64)
    wa = bloom_words(a, "val", m_words=64)
    wb = bloom_words(b, "val", m_words=64)
    merged_df = (
        wa.unionByName(wb).groupBy("idx").agg(F.bit_or("word").alias("word"))
    )
    merged = bloom_dense_vector(merged_df, 64)
    assert merged == whole


def test_bloom_words_positive_and_bounded(spark):
    from ditto_spark.operators.sketch import bloom_words

    df = _values_df(spark, 2000, dup_factor=1).drop("grp")
    rows = bloom_words(df, "val", m_words=32, k=5).collect()
    assert all(0 <= r["idx"] < 32 for r in rows)
    assert all(r["word"] > 0 for r in rows)  # bit 63 never used


def test_bloom_prune_then_join_equals_exact_join(spark):
    from ditto_spark.operators.sketch import (
        bloom_dense_vector,
        bloom_prune,
        bloom_words,
    )

    # master keys 0..399, probe keys 200..999: overlap = 200..399
    master = _values_df(spark, 400, dup_factor=1).drop("grp")
    probe = (
        spark.range(200, 1000)
        .select(F.concat(F.lit("v"), F.col("id")).alias("val"))
    )
    words = bloom_dense_vector(bloom_words(master, "val", m_words=64), 64)
    pruned = bloom_prune(probe, "val", words)
    got = sorted(
        r["val"]
        for r in pruned.join(master.distinct(), "val", "left_semi").collect()
    )
    want = sorted(f"v{i}" for i in range(200, 400))
    assert got == want
    # and the prune itself kept a strict subset of the probe side
    assert pruned.count() < probe.count()
