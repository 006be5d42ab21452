import pyspark.sql.functions as F

from ditto_spark.operators.augment import (
    token_del,
    token_swap,
    drop_sym,
    drop_same,
    drop_len,
    augment_copies,
)


def _df(spark, text="alpha beta gamma delta epsilon zeta eta theta"):
    return spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")


def test_token_del_deterministic_and_bounded(spark):
    df = _df(spark)
    a = {r["doc_id"]: r["augmented"] for r in token_del(df, p=0.3).collect()}
    b = {r["doc_id"]: r["augmented"] for r in token_del(df, p=0.3).collect()}
    assert a == b  # deterministic
    for v in a.values():
        assert len(v.split()) >= 1
        assert set(v.split()) <= set("alpha beta gamma delta epsilon zeta eta theta".split())
    # p=0 → identity
    ident = token_del(df, p=0.0).collect()[0]["augmented"]
    assert ident == "alpha beta gamma delta epsilon zeta eta theta"


def test_token_swap_preserves_multiset(spark):
    df = _df(spark)
    out = token_swap(df, p=1.0).collect()[0]["augmented"]
    assert sorted(out.split()) == sorted("alpha beta gamma delta epsilon zeta eta theta".split())
    # p=1 swaps every adjacent pair
    assert out == "beta alpha delta gamma zeta epsilon theta eta"


def test_drop_sym(spark):
    df = spark.createDataFrame([(1, "a-b, c!! d (e)")], "doc_id long, text string")
    assert drop_sym(df).collect()[0]["augmented"] == "a b c d e"


def test_drop_same_keeps_first(spark):
    df = spark.createDataFrame([(1, "x y x z y x")], "doc_id long, text string")
    assert drop_same(df).collect()[0]["augmented"] == "x y z"


def test_drop_len(spark):
    df = spark.createDataFrame(
        [(1, "short veryverylongtoken ok")], "doc_id long, text string"
    )
    assert drop_len(df, max_len=8).collect()[0]["augmented"] == "short ok"


def test_augment_copies(spark):
    df = _df(spark)
    out = augment_copies(df, n_copies=2, p=0.3)
    rows = out.collect()
    assert len(rows) == 6  # 2 docs x (original + 2 copies)
    for r in rows:
        if r["copy_idx"] == 0:
            assert r["augmented"] == r["text"]  # original untouched
    # deterministic across recomputation
    again = augment_copies(df, n_copies=2, p=0.3).collect()
    key = lambda r: (r["doc_id"], r["copy_idx"])  # noqa: E731
    assert {key(r): r["augmented"] for r in rows} == {key(r): r["augmented"] for r in again}
