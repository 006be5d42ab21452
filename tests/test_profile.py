"""Column profiler: known values, null handling, tie-break determinism."""

import pyspark.sql.functions as F

from ditto_spark.operators.profile import profile_columns


def test_profile_known_values(spark):
    df = spark.createDataFrame(
        [
            ("a", 1, None),
            ("b", 1, "x"),
            ("b", 2, "x"),
            (None, 2, "yy"),
        ],
        ["s", "i", "t"],
    )
    out = {r["attr"]: r for r in profile_columns(df, ["s", "i", "t"]).collect()}
    assert out["s"]["n_rows"] == 4 and out["s"]["n_null"] == 1
    assert out["s"]["null_frac"] == 0.25
    assert out["s"]["n_distinct"] == 2
    assert out["s"]["top_value"] == "b" and out["s"]["top_count"] == 2
    # int column stringified; 1 and 2 tie at 2 -> smallest value wins
    assert out["i"]["top_value"] == "1" and out["i"]["top_count"] == 2
    assert out["i"]["n_null"] == 0
    # avg_len weighted by count: ('x' x2, 'yy' x1) -> (1+1+2)/3
    assert out["t"]["avg_len"] == round(4 / 3, 4)


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "a int, b string")
    out = {r["attr"]: r for r in profile_columns(df, ["b"]).collect()}
    assert out["b"]["n_null"] == 2
    assert out["b"]["n_distinct"] == 0
    assert out["b"]["top_value"] is None
    assert out["b"]["avg_len"] is None


def test_profile_partition_invariant(spark):
    df = spark.range(1000).select(
        (F.col("id") % 7).cast("string").alias("k"),
        (F.col("id") % 13).alias("v"),
    )
    a = sorted(map(tuple, profile_columns(df, ["k", "v"]).collect()))
    b = sorted(map(tuple, profile_columns(df.repartition(23), ["k", "v"]).collect()))
    assert a == b


def test_exact_quantiles_known_values(spark):
    from ditto_spark.operators.profile import exact_quantiles

    df = spark.createDataFrame([(i, i * 10) for i in range(1, 101)], "id long, v long")
    out = {r["prob"]: r["value"] for r in exact_quantiles(df, "v", [0.5, 0.9, 1.0], ["id"]).collect()}
    # type-1/percentile_disc: rank ceil(p*100)
    assert out[0.5] == 500 and out[0.9] == 900 and out[1.0] == 1000


def test_exact_quantiles_nulls_excluded_and_min_prob(spark):
    from ditto_spark.operators.profile import exact_quantiles

    df = spark.createDataFrame(
        [(1, None), (2, 5), (3, 7)], "id long, v long"
    )
    out = {r["prob"]: r["value"] for r in exact_quantiles(df, "v", [0.01, 1.0], ["id"]).collect()}
    assert out[0.01] == 5 and out[1.0] == 7


def test_exact_quantiles_partition_invariant(spark):
    from ditto_spark.operators.profile import exact_quantiles

    df = spark.range(997).select(
        F.col("id"), ((F.col("id") * 37) % 1000).alias("v")
    )
    a = sorted(map(tuple, exact_quantiles(df, "v", [0.25, 0.75], ["id"]).collect()))
    b = sorted(
        map(tuple, exact_quantiles(df.repartition(19), "v", [0.25, 0.75], ["id"]).collect())
    )
    assert a == b


def test_attribute_alignment_known_overlap(spark):
    """Planted value-set overlap: A.x = 0..49, B.y = 25..74 → inter ≈ 25,
    identical columns → jaccard exactly 1.0 (identical registers make
    union = |A| so inclusion-exclusion is exact), disjoint columns → 0."""
    from ditto_spark.operators.profile import attribute_alignment

    a = spark.createDataFrame(
        [(i, f"u{i}") for i in range(50)], "x long, xx string"
    )
    b = spark.createDataFrame(
        [(i + 25, f"v{i}") for i in range(50)], "y long, yy string"
    )
    out = {
        (r["col_a"], r["col_b"]): r
        for r in attribute_alignment(a, b).collect()
    }
    r = out[("x", "y")]
    assert abs(r["est_inter"] - 25) < 3, r
    assert 0.2 < r["est_jaccard"] < 0.5, r
    # disjoint sets: inclusion-exclusion on sketch estimates leaves a
    # small positive residual (est noise), never a confident overlap
    assert out[("xx", "yy")]["est_jaccard"] < 0.05
    same = {
        (r["col_a"], r["col_b"]): r
        for r in attribute_alignment(
            a, a.withColumnsRenamed({"x": "x2", "xx": "xx2"})
        ).collect()
    }
    assert same[("x", "x2")]["est_jaccard"] == 1.0
    assert same[("xx", "xx2")]["est_jaccard"] == 1.0


def test_attribute_alignment_null_and_partition_invariance(spark):
    from ditto_spark.operators.profile import attribute_alignment

    a = spark.createDataFrame(
        [(i,) for i in range(30)] + [(None,)], "x long"
    )
    b = spark.createDataFrame([(i,) for i in range(30)], "y long")
    r1 = sorted(map(tuple, attribute_alignment(a, b).collect()))
    r2 = sorted(map(tuple, attribute_alignment(a.repartition(7), b).collect()))
    assert r1 == r2
    # the null contributes nothing: est_a == est_b
    row = attribute_alignment(a, b).collect()[0]
    assert row["est_a"] == row["est_b"]


def test_attribute_alignment_containment_detects_inclusion(spark):
    """FK-shape: B.y ⊂ A.x (10 of 100 values) → containment_b ≈ 1 while
    jaccard ≈ 0.1 — the directional signal symmetric jaccard hides."""
    from ditto_spark.operators.profile import attribute_alignment

    a = spark.createDataFrame([(i,) for i in range(100)], "x long")
    b = spark.createDataFrame([(i,) for i in range(10)], "y long")
    r = attribute_alignment(a, b).collect()[0]
    assert r["est_containment_b"] > 0.9, r
    assert r["est_containment_a"] < 0.2, r
    assert r["est_jaccard"] < 0.2, r
