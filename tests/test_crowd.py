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


def test_glad_recovers_truth_and_is_deterministic(spark):
    from ditto_spark.operators.crowd import glad

    votes, truth = _votes(spark)
    out = glad(votes).collect()
    got = {r["task"]: r["crowd_label"] for r in out}
    assert got == truth
    for r in out:
        if truth[r["task"]] == 1:
            assert r["p1"] > 0.8
        else:
            assert r["p1"] < 0.2
    again = {r["task"]: r["p1"] for r in glad(votes).collect()}
    for t in again:
        first = next(r["p1"] for r in out if r["task"] == t)
        assert abs(first - again[t]) < 1e-12


def test_glad_downweights_adversary_vs_majority(spark):
    """2 reliable vs 1 adversarial + 2 random-ish workers: GLAD should
    recover truth where plain majority is fooled on tasks the adversary +
    one noisy worker outvote a single reliable vote."""
    from ditto_spark.operators.crowd import glad

    # truth alternates; w1 w2 reliable, w3 flips, w4 always says 1
    rows = []
    truth = {}
    for i in range(12):
        t = f"t{i:02d}"
        y = i % 2
        truth[t] = y
        rows.append(("d1", t, "w1", y))
        rows.append(("d1", t, "w2", y))
        rows.append(("d1", t, "w3", 1 - y))
        rows.append(("d1", t, "w4", 1))
    votes = spark.createDataFrame(
        rows, "dataset string, task string, worker string, label int"
    )
    got = {r["task"]: r["crowd_label"] for r in glad(votes).collect()}
    assert got == truth


def test_gold_standard_pattern_lookup(spark):
    from ditto_spark.operators.crowd import gold_standard

    votes, truth_map = _votes(spark)
    truth = spark.createDataFrame(
        [(t, y) for t, y in truth_map.items()], "task string, truth int"
    )
    out = gold_standard(votes, truth, workers=["w1", "w2", "w3"])
    got = {r["task"]: r["agg_label"] for r in out.collect()}
    # patterns here are distinct per truth class and truth-calibrated →
    # perfect recovery
    assert got == truth_map


def test_gold_standard_groups_identical_patterns(spark):
    """Tasks with the same vote pattern get the pattern's majority truth —
    even a task whose own truth disagrees (the reference's lookup-table
    semantics)."""
    from ditto_spark.operators.crowd import gold_standard

    rows = []
    # 3 tasks, identical pattern (1,0); truths 1,1,0 → pattern label 1
    for t in ["a", "b", "c"]:
        rows.append((t, "w1", 1))
        rows.append((t, "w2", 0))
    votes = spark.createDataFrame(rows, "task string, worker string, label int")
    truth = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 0)], "task string, truth int"
    )
    got = {
        r["task"]: r["agg_label"]
        for r in gold_standard(votes, truth, workers=["w1", "w2"]).collect()
    }
    assert got == {"a": 1, "b": 1, "c": 1}


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
