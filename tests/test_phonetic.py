"""Soundex: canonical codes, builtin agreement, degenerate inputs."""

import pyspark.sql.functions as F

from ditto_spark.operators.phonetic import soundex_key

CANONICAL = {
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",  # h/w collapse rule
    "Ashcroft": "A261",
    "Tymczak": "T522",  # vowel separates equal codes
    "Pfister": "P236",  # first letter's code run dropped
    "Honeyman": "H555",
    "Wheeler": "W460",  # h/w-initial keeps following codes
    "Euler": "E460",  # vowel-initial keeps first consonant code
    "Lloyd": "L300",
    "O'Brien": "O165",  # non-letters stripped
    "a": "A000",
}


def test_soundex_canonical_codes(spark):
    df = spark.createDataFrame([(n,) for n in CANONICAL], "name string")
    got = {
        r["name"]: r["sx"]
        for r in df.select("name", soundex_key(F.col("name")).alias("sx")).collect()
    }
    assert got == CANONICAL


def test_soundex_no_letters_is_null(spark):
    df = spark.createDataFrame([("123",), ("  ",), ("",), (None,)], "name string")
    got = [r["sx"] for r in df.select(soundex_key(F.col("name")).alias("sx")).collect()]
    assert got == [None] * 4


def test_soundex_agrees_with_spark_builtin_on_words(spark):
    """Pin parity with Spark's builtin soundex on real corpus words (the
    builtin passes non-alphabetic inputs through; ours nulls them — filtered
    here)."""
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    words = part.select(
        F.explode(F.split("p_name", " ")).alias("w")
    ).where(F.col("w").rlike("^[A-Za-z]+$")).distinct()
    diff = (
        words.select(
            "w",
            soundex_key(F.col("w")).alias("ours"),
            F.soundex(F.upper("w")).alias("builtin"),
        )
        .where(F.col("ours") != F.col("builtin"))
        .count()
    )
    assert diff == 0


def test_soundex_zero_exchange_plan(spark):
    df = spark.createDataFrame([("Robert",)], "name string")
    plan = (
        df.select(soundex_key(F.col("name")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_jaro_winkler_canonical_values(spark):
    from ditto_spark.operators.phonetic import jaro_winkler_udf

    cases = [
        ("martha", "marhta", 0.9611111111),
        ("dixon", "dicksonx", 0.8133333333),
        ("jellyfish", "smellyfish", 0.8962962963),  # jaro <= 0.7? no: no boost (prefix 0)
        ("duane", "dwayne", 0.84),
        ("crate", "trace", 0.7333333333),  # jaro > 0.7 but prefix 0
        ("ab", "ba", 0.0),  # match window 0
        ("abc", "abc", 1.0),
        ("abc", "", 0.0),
    ]
    df = spark.createDataFrame(cases, "a string, b string, expect double")
    jw = jaro_winkler_udf()
    import pyspark.sql.functions as F

    rows = df.select("a", "b", "expect", jw(F.col("a"), F.col("b")).alias("got")).collect()
    for r in rows:
        assert abs(r["got"] - r["expect"]) < 1e-9, (r["a"], r["b"], r["got"])


def test_jaro_winkler_nulls_propagate(spark):
    from ditto_spark.operators.phonetic import jaro_winkler_udf
    import pyspark.sql.functions as F

    df = spark.createDataFrame([("a", None), (None, "b"), ("x", "x")], "a string, b string")
    jw = jaro_winkler_udf()
    got = [r["j"] for r in df.select(jw(F.col("a"), F.col("b")).alias("j")).collect()]
    assert got[0] is None and got[1] is None and got[2] == 1.0


def test_monge_elkan_matches_hand_computation(spark):
    """ME vs a driver-side reimplementation using DuckDB's builtin JW (which
    test_jaro_winkler_canonical_values pins as bit-identical to our UDF)."""
    import duckdb

    from ditto_spark.operators.phonetic import monge_elkan_scores

    pairs = [
        ("p1", "jonathan q smith", "smith jonathon"),
        ("p2", "margaret thatcher", "thatcher m"),
        ("p3", "abc", "abc"),
    ]
    df = spark.createDataFrame(pairs, "pid string, a string, b string")
    got = {
        r["pid"]: r["monge_elkan"]
        for r in monge_elkan_scores(df, "a", "b", ["pid"]).collect()
    }

    con = duckdb.connect()

    def jw(x, y):
        return con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [x, y]
        ).fetchone()[0]

    def me_dir(ta, tb):
        return sum(max(jw(a, b) for b in tb) for a in ta) / len(ta)

    for pid, a, b in pairs:
        ta, tb = a.split(" "), b.split(" ")
        expect = (me_dir(ta, tb) + me_dir(tb, ta)) / 2
        assert abs(got[pid] - expect) < 1e-9, pid

    assert got["p3"] == 1.0


def test_monge_elkan_single_token_equals_jw(spark):
    """On single-token strings ME degenerates to plain Jaro-Winkler."""
    import pyspark.sql.functions as F

    from ditto_spark.operators.phonetic import (
        jaro_winkler_udf,
        monge_elkan_scores,
    )

    df = spark.createDataFrame(
        [("x", "martha", "marhta"), ("y", "dixon", "dicksonx")],
        "pid string, a string, b string",
    )
    me = {
        r["pid"]: r["monge_elkan"]
        for r in monge_elkan_scores(df, "a", "b", ["pid"]).collect()
    }
    jwf = jaro_winkler_udf()
    jw = {
        r["pid"]: r["j"]
        for r in df.select("pid", jwf(F.col("a"), F.col("b")).alias("j")).collect()
    }
    for pid in me:
        assert abs(me[pid] - jw[pid]) < 1e-12


def test_monge_elkan_symmetric_order_invariant(spark):
    from ditto_spark.operators.phonetic import monge_elkan_scores

    df = spark.createDataFrame(
        [("p", "jonathan q smith", "smith jonathon")], "pid string, a string, b string"
    )
    fwd = monge_elkan_scores(df, "a", "b", ["pid"]).collect()[0]["monge_elkan"]
    rev = monge_elkan_scores(df, "b", "a", ["pid"]).collect()[0]["monge_elkan"]
    assert abs(fwd - rev) < 1e-12
