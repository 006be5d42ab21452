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


def test_dawid_skene_relational_matches_applyinpandas(spark):
    """The relational EM and the per-group numpy EM implement the same
    math, so at the same iteration count they agree to float tolerance —
    on a richer corpus than _votes: 2 datasets × 40 tasks × 9 workers of
    mixed reliability, including a noisy coin-flip worker."""
    from ditto_spark.operators.crowd import dawid_skene_relational

    rows = []
    for d in ("d1", "d2"):
        for t in range(40):
            y = (t * 7 + (0 if d == "d1" else 3)) % 2
            for w in range(9):
                if w < 5:  # reliable
                    lab = y
                elif w < 7:  # adversarial
                    lab = 1 - y
                else:  # noisy, deterministic pseudo-coin
                    lab = (t * 13 + w * 31) % 2
                rows.append((d, f"t{t}", f"w{w}", lab))
    votes = spark.createDataFrame(
        rows, "dataset string, task string, worker string, label int"
    )
    a = {
        (r["dataset"], r["task"]): (r["crowd_label"], r["p1"])
        for r in dawid_skene(votes, n_iter=20).collect()
    }
    b = {
        (r["dataset"], r["task"]): (r["crowd_label"], r["p1"])
        for r in dawid_skene_relational(votes, n_iter=20).collect()
    }
    assert a.keys() == b.keys() and len(a) == 80
    for k in a:
        assert a[k][0] == b[k][0], k
        assert abs(a[k][1] - b[k][1]) < 1e-6, (k, a[k], b[k])


def test_dawid_skene_relational_one_step_vote_mean_monotone(spark):
    """After one relational EM step the reliable-majority tasks keep their
    majority label (sanity for the oracle-checked single step)."""
    from ditto_spark.operators.crowd import dawid_skene_relational

    votes, truth = _votes(spark)
    out = {
        r["task"]: r["crowd_label"]
        for r in dawid_skene_relational(votes, n_iter=1).collect()
    }
    assert out == truth


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


def test_worker_chi2_dependence_ranking(spark):
    """w3 always flips w1 (perfectly dependent given truth); w4 votes by
    coin-of-task-hash (near-independent of w1). chi2_max must rank the
    dependent pair far above the independent one."""
    from ditto_spark.operators.crowd import worker_independence_chi2

    rows, truth_rows = [], []
    for i in range(60):
        t = f"t{i:03d}"
        y = i % 2
        truth_rows.append((t, y))
        w1 = y if i % 5 else 1 - y  # mostly-correct worker
        rows.append((t, "w1", w1))
        rows.append((t, "w3", 1 - w1))          # anti-copy of w1
        rows.append((t, "w4", (i * 7) % 3 % 2))  # unrelated pattern
    votes = spark.createDataFrame(rows, "task string, worker string, label int")
    truth = spark.createDataFrame(truth_rows, "task string, truth int")
    out = {
        (r["w1"], r["w2"]): r["chi2_max"]
        for r in worker_independence_chi2(votes, truth).collect()
    }
    assert out[("w1", "w3")] > out[("w1", "w4")] * 3
    assert all(v >= 0 for v in out.values())


def test_worker_chi2_matches_scipy_formula(spark):
    """Yates-corrected 2x2 chi-square must equal the textbook value on a
    hand-checkable table."""
    from ditto_spark.operators.crowd import worker_independence_chi2

    # one truth class only; contingency for (wa, wb): n00=20 n01=5 n10=5 n11=20
    rows = []
    truth_rows = []
    k = 0
    for n, (la, lb) in [(20, (0, 0)), (5, (0, 1)), (5, (1, 0)), (20, (1, 1))]:
        for _ in range(n):
            t = f"t{k:03d}"
            k += 1
            truth_rows.append((t, 1))
            rows.append((t, "wa", la))
            rows.append((t, "wb", lb))
    votes = spark.createDataFrame(rows, "task string, worker string, label int")
    truth = spark.createDataFrame(truth_rows, "task string, truth int")
    r = worker_independence_chi2(votes, truth).collect()[0]
    n = 50.0
    expected = n * (abs(20 * 20 - 5 * 5) - n / 2) ** 2 / (25 * 25 * 25 * 25)
    assert abs(r["chi2_y1"] - expected) < 1e-9
    assert r["chi2_y0"] == 0.0


def test_optimal_f1_cutoff_recovers_pattern_labels(spark):
    """Patterns whose mean truth is separable: the sweep must pick a level
    that labels the high-truth pattern 1 and the low-truth pattern 0."""
    from ditto_spark.operators.crowd import optimal_f1_cutoff

    rows, truth_rows = [], []
    # pattern A (votes 1,1): tasks 0-9, truth 1 for 9 of 10
    # pattern B (votes 0,1): tasks 10-19, truth 1 for 1 of 10
    for i in range(20):
        t = f"t{i:02d}"
        pat = (1, 1) if i < 10 else (0, 1)
        y = 1 if (i < 9 or i == 10) else 0
        truth_rows.append((t, y))
        rows.append((t, "w1", pat[0]))
        rows.append((t, "w2", pat[1]))
    votes = spark.createDataFrame(rows, "task string, worker string, label int")
    truth = spark.createDataFrame(truth_rows, "task string, truth int")
    got = {
        r["task"]: r["agg_label"]
        for r in optimal_f1_cutoff(votes, truth, workers=["w1", "w2"]).collect()
    }
    for i in range(20):
        assert got[f"t{i:02d}"] == (1 if i < 10 else 0)


def test_worker_partial_correlations_closed_form(spark):
    """Pairwise partial correlation vs a numpy recomputation of the same
    closed form (r_xy − r_xt·r_yt)/sqrt((1−r_xt²)(1−r_yt²)) on the pivoted
    matrix — the formula pingouin evaluates for a single covariate."""
    import numpy as np

    from ditto_spark.operators.crowd import worker_partial_correlations

    rng = np.random.default_rng(11)
    truth_arr = rng.integers(0, 2, 40)
    # w1/w2 follow truth with independent noise; w3 copies w2's noise → the
    # w2-w3 partial correlation given truth must dominate w1-w2's
    flips2 = rng.random(40) < 0.3
    w1 = np.where(rng.random(40) < 0.3, 1 - truth_arr, truth_arr)
    w2 = np.where(flips2, 1 - truth_arr, truth_arr)
    w3 = np.where(flips2, 1 - truth_arr, truth_arr)
    rows = []
    for i in range(40):
        rows += [(f"t{i:02d}", "w1", int(w1[i])), (f"t{i:02d}", "w2", int(w2[i])),
                 (f"t{i:02d}", "w3", int(w3[i]))]
    votes = spark.createDataFrame(rows, "task string, worker string, label int")
    truth = spark.createDataFrame(
        [(f"t{i:02d}", int(truth_arr[i])) for i in range(40)],
        "task string, truth int",
    )
    got = {
        (r["w1"], r["w2"]): r
        for r in worker_partial_correlations(votes, truth).collect()
    }
    mats = {"w1": w1, "w2": w2, "w3": w3}
    for (a, b), r in got.items():
        r_xy = np.corrcoef(mats[a], mats[b])[0, 1]
        r_xt = np.corrcoef(mats[a], truth_arr)[0, 1]
        r_yt = np.corrcoef(mats[b], truth_arr)[0, 1]
        exp = (r_xy - r_xt * r_yt) / np.sqrt((1 - r_xt**2) * (1 - r_yt**2))
        assert abs(r["partial_r"] - exp) < 1e-9
    assert got[("w2", "w3")]["partial_r"] == 1.0  # identical noise
    assert got[("w2", "w3")]["partial_r"] > got[("w1", "w2")]["partial_r"]


def test_worker_removal_curve_order_and_f1(spark):
    """Best worker removed first; majority-vote F1 degrades once only the
    adversary remains."""
    from ditto_spark.operators.crowd import worker_f1_ranking, worker_removal_curve

    votes, truth_map = _votes(spark)
    truth = spark.createDataFrame(
        list(truth_map.items()), "task string, truth int"
    )
    ranked = {
        r["worker"]: r["removal_rank"]
        for r in worker_f1_ranking(votes, truth).collect()
    }
    # w1/w2 perfect (F1 1.0, tie → worker desc: w2 first), w3 adversarial
    assert ranked == {"w2": 0, "w1": 1, "w3": 2}
    curve = {
        (r["n_removed"], r["method"]): r["f1"]
        for r in worker_removal_curve(votes, truth).collect()
    }
    assert curve[(0, "majority_vote")] == 1.0  # 2 good vs 1 bad
    assert curve[(2, "majority_vote")] == 0.0  # only the adversary left
    assert curve[(2, "wawa")] == 0.0
