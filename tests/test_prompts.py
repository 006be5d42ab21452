"""P8/P9 prompt rendering vs a direct Python port of the reference logic
(convert_to_csv.py:7-48, prompt_generator.py:15-19)."""

import re

import pyspark.sql.functions as F  # noqa: F401

from ditto_spark.operators.prompts import render_pair_csv, render_template_prompt

LANGUAGE_TAG = r'"@[a-z][a-z](-[a-zA-Z]*)?'
COLVAL = r"COL ([a-zA-Z]+) VAL +"


def _reference_clean(entry: str) -> str:
    # verbatim reference semantics for the expected value
    line = re.sub(LANGUAGE_TAG, "", entry)
    line = line.replace('"', "")
    line = re.sub(COLVAL, r"\n\1: ", line)
    line = line.strip()
    return "\n".join(l[:1000] for l in line.split("\n"))


def test_render_pair_csv_matches_reference(spark):
    left = 'COL title VAL canon camera "@en COL price VAL 99.99'
    right = 'COL title VAL "canon" cam COL brand VAL canon'
    df = spark.createDataFrame(
        [(1, left, right, 1), (2, left, right, 0)],
        "pair_id long, left_txt string, right_txt string, label int",
    )
    out = {r["pair_id"]: r for r in render_pair_csv(df).collect()}
    el, er = _reference_clean(left), _reference_clean(right)
    assert out[1]["left"] == el
    assert out[1]["right"] == er
    assert out[1]["prompt"] == f"{el}\n\n###\n\n{er}\n\n###\n\nSame product?"
    assert out[1]["match"] is True and out[1]["completion"] == " yes"
    assert out[2]["match"] is False and out[2]["completion"] == " no"


def test_render_pair_csv_truncates_long_lines(spark):
    long_val = "x" * 1500
    df = spark.createDataFrame(
        [(1, f"COL a VAL {long_val}", "COL b VAL y", 0)],
        "pair_id long, left_txt string, right_txt string, label int",
    )
    out = render_pair_csv(df).collect()[0]
    assert out["left"] == ("a: " + long_val)[:1000]


def test_render_template_prompt(spark):
    df = spark.createDataFrame(
        [("c1 text", "c2 text")], "left_txt string, right_txt string"
    )
    got = render_template_prompt(
        df,
        preamble="You are a detective.",
        c1sentence="Product one:",
        c2sentence="Product two:",
        question="Same?",
    ).collect()[0]["prompt"]
    assert got == (
        "You are a detective.\n\nProduct one:\nc1 text\n\n"
        "Product two:\nc2 text\n\nSame?"
    )
    no_pre = render_template_prompt(
        df, preamble="P", c1sentence="A:", c2sentence="B:", question="Q?",
        include_preamble=False,
    ).collect()[0]["prompt"]
    assert no_pre == "A:\nc1 text\n\nB:\nc2 text\n\nQ?"
