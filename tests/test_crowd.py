import pyspark.sql.functions as F

from ditto_spark.operators.crowd import majority_vote, wawa, dawid_skene


def _votes(spark):
    """3 workers; w1/w2 reliable, w3 adversarial (always flips truth).
    Truth: t1=1 t2=0 t3=1 t4=0."""
    truth = {"t1": 1, "t2": 0, "t3": 1, "t4": 0}
    rows = []
    for t, y in truth.items():
        rows.append(("d1", t, "w1", y))
        rows.append(("d1", t, "w2", y))
        rows.append(("d1", t, "w3", 1 - y))
    return spark.createDataFrame(
        rows, "dataset string, task string, worker string, label int"
    ), truth


def test_majority_vote(spark):
    votes, truth = _votes(spark)
    got = {r["task"]: r["crowd_label"] for r in majority_vote(votes).collect()}
    assert got == truth


def test_majority_vote_tie_is_zero(spark):
    votes = spark.createDataFrame(
        [("t1", "w1", 1), ("t1", "w2", 0)], "task string, worker string, label int"
    )
    got = majority_vote(votes).collect()[0]
    assert got["crowd_label"] == 0  # strict > 0.5 (analyze_gpt.py mean > .5)


def test_wawa_downweights_adversary(spark):
    votes, truth = _votes(spark)
    got = {r["task"]: r["crowd_label"] for r in wawa(votes).collect()}
    assert got == truth


def test_dawid_skene_recovers_truth_and_probs(spark):
    votes, truth = _votes(spark)
    out = dawid_skene(votes).collect()
    got = {r["task"]: r["crowd_label"] for r in out}
    assert got == truth
    # EM should become confident: p1 near 1 for label-1 tasks, near 0 else
    for r in out:
        if truth[r["task"]] == 1:
            assert r["p1"] > 0.9
        else:
            assert r["p1"] < 0.1


def test_dawid_skene_multiple_datasets_parallel(spark):
    v1, _ = _votes(spark)
    v2 = v1.withColumn("dataset", F.lit("d2"))
    both = v1.unionByName(v2)
    out = dawid_skene(both).collect()
    assert len(out) == 8
    ds = {r["dataset"] for r in out}
    assert ds == {"d1", "d2"}


def test_bwa_recovers_truth(spark):
    from ditto_spark.operators.crowd import bwa

    votes, truth = _votes(spark)
    out = bwa(votes).collect()
    got = {r["task"]: r["crowd_label"] for r in out}
    assert got == truth
    for r in out:
        assert 0.0 <= r["z1"] <= 1.0 + 1e-9


def test_ebcc_recovers_truth(spark):
    from ditto_spark.operators.crowd import ebcc

    votes, truth = _votes(spark)
    out = ebcc(votes, n_restarts=3).collect()
    got = {r["task"]: r["crowd_label"] for r in out}
    assert got == truth
    # deterministic across invocations (seeded restarts)
    again = {r["task"]: r["p1"] for r in ebcc(votes, n_restarts=3).collect()}
    first = {r["task"]: r["p1"] for r in out}
    for t in first:
        assert abs(first[t] - again[t]) < 1e-12
