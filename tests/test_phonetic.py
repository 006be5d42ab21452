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
