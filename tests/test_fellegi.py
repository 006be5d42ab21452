import math
import random

import pyspark.sql.functions as F
import pytest

from ditto_spark.operators.fellegi import (
    FieldComparison,
    comparison_vectors,
    estimate_fs,
    exact_fuzzy_gamma,
    exact_gamma,
    fs_score,
    numeric_band_gamma,
)


def _em_py(patterns, fields, iters, prior, init):
    """Independent plain-Python EM (dict/loop, no numpy) for cross-check."""
    m = {n: list(init[n][0]) for n, _ in fields}
    u = {n: list(init[n][1]) for n, _ in fields}
    lam = prior
    names = [n for n, _ in fields]
    for _ in range(iters):
        ws = []
        for gam, c in patterns:
            num = lam
            den_u = 1.0 - lam
            for i, n in enumerate(names):
                num *= m[n][gam[i]]
                den_u *= u[n][gam[i]]
            ws.append(num / (num + den_u))
        wm_tot = sum(w * c for w, (_, c) in zip(ws, patterns))
        wu_tot = sum((1 - w) * c for w, (_, c) in zip(ws, patterns))
        lam = wm_tot / sum(c for _, c in patterns)
        for i, (n, lv) in enumerate(fields):
            m[n] = [
                sum(
                    w * c
                    for w, (gam, c) in zip(ws, patterns)
                    if gam[i] == l
                )
                / wm_tot
                for l in range(lv)
            ]
            u[n] = [
                sum(
                    (1 - w) * c
                    for w, (gam, c) in zip(ws, patterns)
                    if gam[i] == l
                )
                / wu_tot
                for l in range(lv)
            ]
    return m, u, lam


FIELDS2 = [
    FieldComparison("x", 3, exact_fuzzy_gamma()),
    FieldComparison("y", 2, exact_gamma()),
]


def test_em_matches_independent_python(spark):
    rng = random.Random(11)
    rows = [(rng.randrange(3), rng.randrange(2)) for _ in range(400)]
    gammas = spark.createDataFrame(
        [(i, i, gx, gy) for i, (gx, gy) in enumerate(rows)],
        "left_id long, right_id long, gamma_x int, gamma_y int",
    )
    init = {"x": ([0.05, 0.15, 0.8], [0.8, 0.15, 0.05]), "y": ([0.2, 0.8], [0.8, 0.2])}
    got = {
        (r["field"], r["gamma_level"]): r
        for r in estimate_fs(
            gammas, FIELDS2, iters=7, prior=0.5, init=init
        ).collect()
    }

    counts = {}
    for gx, gy in rows:
        counts[(gx, gy)] = counts.get((gx, gy), 0) + 1
    patterns = [(k, float(c)) for k, c in counts.items()]
    m, u, lam = _em_py(patterns, [("x", 3), ("y", 2)], 7, 0.5, init)

    for n, lv in [("x", 3), ("y", 2)]:
        for l in range(lv):
            r = got[(n, l)]
            assert r["m_prob"] == pytest.approx(m[n][l], abs=1e-9)
            assert r["u_prob"] == pytest.approx(u[n][l], abs=1e-9)
            assert r["prior_match"] == pytest.approx(lam, abs=1e-9)
            assert r["match_weight"] == pytest.approx(
                math.log2((m[n][l] + 1e-9) / (u[n][l] + 1e-9)), abs=1e-9
            )


def test_em_recovers_planted_parameters(spark):
    """Gammas drawn from a known FS model with three conditionally
    independent fields (the Fellegi-Sunter identifiability minimum): EM
    should recover lambda and the m/u structure without labels."""
    rng = random.Random(5)

    def draw(p):
        x = rng.random()
        acc = 0.0
        for i, pi in enumerate(p):
            acc += pi
            if x < acc:
                return i
        return len(p) - 1

    true_lam = 0.1
    m = {"x": [0.05, 0.15, 0.8], "y": [0.1, 0.9], "z": [0.1, 0.2, 0.7]}
    u = {"x": [0.9, 0.08, 0.02], "y": [0.85, 0.15], "z": [0.7, 0.2, 0.1]}
    rows = []
    for i in range(6000):
        src = m if rng.random() < true_lam else u
        rows.append((i, i, draw(src["x"]), draw(src["y"]), draw(src["z"])))
    gammas = spark.createDataFrame(
        rows,
        "left_id long, right_id long, gamma_x int, gamma_y int, gamma_z int",
    )
    fields3 = FIELDS2 + [FieldComparison("z", 3, exact_fuzzy_gamma())]
    got = {
        (r["field"], r["gamma_level"]): r
        for r in estimate_fs(gammas, fields3, iters=40, prior=0.5).collect()
    }
    lam = got[("x", 0)]["prior_match"]
    assert abs(lam - true_lam) < 0.03
    assert got[("x", 2)]["m_prob"] > 0.6
    assert got[("x", 2)]["u_prob"] < 0.1
    assert got[("x", 0)]["u_prob"] > 0.7


def test_fs_score_literal_weights(spark):
    params = {"x": ([0.1, 0.2, 0.7], [0.7, 0.2, 0.1]), "y": ([0.2, 0.8], [0.9, 0.1])}
    gammas = spark.createDataFrame(
        [(1, 2, 2, 1), (3, 4, 0, 0)],
        "left_id long, right_id long, gamma_x int, gamma_y int",
    )
    rows = {
        (r["left_id"], r["right_id"]): r
        for r in fs_score(gammas, FIELDS2, params, prior=0.2).collect()
    }
    eps = 1e-9
    w_match = (
        math.log2(0.2 / 0.8)
        + math.log2((0.7 + eps) / (0.1 + eps))
        + math.log2((0.8 + eps) / (0.1 + eps))
    )
    w_miss = (
        math.log2(0.2 / 0.8)
        + math.log2((0.1 + eps) / (0.7 + eps))
        + math.log2((0.2 + eps) / (0.9 + eps))
    )
    assert rows[(1, 2)]["match_weight"] == pytest.approx(w_match, abs=1e-9)
    assert rows[(3, 4)]["match_weight"] == pytest.approx(w_miss, abs=1e-9)
    assert rows[(1, 2)]["posterior"] == pytest.approx(
        2**w_match / (1 + 2**w_match), abs=1e-9
    )
    assert rows[(3, 4)]["tf_adj"] == 0.0


def test_fs_tf_adjustment_rare_beats_common(spark):
    """Splink-style TF adjustment: exact agreement on a rare value gets a
    positive adjustment; on a very common value, a negative one."""
    params = {"x": ([0.1, 0.2, 0.7], [0.7, 0.2, 0.1]), "y": ([0.2, 0.8], [0.9, 0.1])}
    gammas = spark.createDataFrame(
        [(1, 2, "rare", 2, 1), (3, 4, "common", 2, 1), (5, 6, "other", 1, 1)],
        "left_id long, right_id long, x string, gamma_x int, gamma_y int",
    )
    tf = spark.createDataFrame(
        [("rare", 0.01), ("common", 0.5), ("other", 0.2)], "val string, tf double"
    )
    rows = {
        (r["left_id"], r["right_id"]): r
        for r in fs_score(
            gammas, FIELDS2, params, prior=0.2,
            tf_field="x", tf_df=tf, tf_value_col="val",
        ).collect()
    }
    # generic u for exact x-agreement is 0.1: rarer than that -> boost
    assert rows[(1, 2)]["tf_adj"] == pytest.approx(
        math.log2(0.1 + 1e-9) - math.log2(0.01), abs=1e-6
    )
    assert rows[(1, 2)]["tf_adj"] > 0 > rows[(3, 4)]["tf_adj"]
    assert rows[(5, 6)]["tf_adj"] == 0.0  # non-exact agreement: no adjustment
    assert rows[(1, 2)]["posterior"] > rows[(3, 4)]["posterior"]


def test_fs_end_to_end_unsupervised_linkage(spark):
    """Full FS flow on the deterministic dirty-pair corpus: block, gamma,
    EM-fit, score with the fitted params, threshold at posterior 0.5 —
    the unsupervised linkage should recover doc_id-equality truth with
    high F1 (near-duplicate documents planted in the corpus make a
    handful of extra true-ish matches, so the bar is 0.9, not 1.0)."""
    import __spark_entry__ as E

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    gam = E._fs_gammas(docs)
    fields = E._fs_fields()
    est = estimate_fs(gam, fields, iters=15, prior=0.5)
    rows = est.collect()
    lam = rows[0]["prior_match"]
    params = {}
    for f in fields:
        mv = [0.0] * f.levels
        uv = [0.0] * f.levels
        for r in rows:
            if r["field"] == f.name:
                mv[r["gamma_level"]] = r["m_prob"]
                uv[r["gamma_level"]] = r["u_prob"]
        params[f.name] = (mv, uv)
    scored = fs_score(gam, fields, params, prior=lam)
    pred = scored.select(
        "left_id", "right_id", (F.col("posterior") > 0.5).alias("pred")
    )
    stats = pred.select(
        F.sum(
            ((F.col("left_id") == F.col("right_id")) & F.col("pred")).cast("int")
        ).alias("tp"),
        F.sum(
            ((F.col("left_id") != F.col("right_id")) & F.col("pred")).cast("int")
        ).alias("fp"),
        F.sum(
            ((F.col("left_id") == F.col("right_id")) & ~F.col("pred")).cast("int")
        ).alias("fn"),
    ).collect()[0]
    f1 = 2 * stats["tp"] / (2 * stats["tp"] + stats["fp"] + stats["fn"])
    assert f1 >= 0.9, (stats, f1)


def test_comparison_vectors_gamma_levels(spark):
    a = spark.createDataFrame(
        [(1, "k", "alpha beta", 100)], "left_id long, blk string, t string, n long"
    )
    b = spark.createDataFrame(
        [
            (10, "k", "alpha beta", 100),   # exact / exact
            (11, "k", "alpha betaX", 130),  # lev 1 / loose band
            (12, "k", "zzz yyy", 500),      # disagree / disagree
            (13, "other", "alpha beta", 100),  # different block: no pair
        ],
        "right_id long, blk string, t string, n long",
    )
    fields = [
        FieldComparison("t", 3, exact_fuzzy_gamma(max_dist=2)),
        FieldComparison("n", 3, numeric_band_gamma(tight=10, loose=50)),
    ]
    got = {
        r["right_id"]: (r["gamma_t"], r["gamma_n"])
        for r in comparison_vectors(a, b, "blk", fields).collect()
    }
    assert got == {10: (2, 2), 11: (1, 1), 12: (0, 0)}


def test_union_blocking_modes_and_null_keys(spark):
    from ditto_spark.operators.fellegi import union_blocking

    a = spark.createDataFrame(
        [(1, "k1", "s1"), (2, "k2", None), (3, None, "s2")],
        "left_id long, blk string, src string",
    )
    b = spark.createDataFrame(
        [(1, "k1", "s9"), (5, "k2", None), (6, "zz", "s2"), (7, None, "s1")],
        "right_id long, blk string, src string",
    )
    got = {
        (r["left_id"], r["right_id"])
        for r in union_blocking(a, b, ["blk", "src"], mode="link").collect()
    }
    # blk rule: (1,1) k1, (2,5) k2; src rule: (1,7) s1, (3,6) s2.
    # null keys never join (2-null src, 3-null blk); (1,1) kept in link mode
    assert got == {(1, 1), (2, 5), (1, 7), (3, 6)}

    # dedupe mode on a self-join: one orientation, no self pairs
    recs = spark.createDataFrame(
        [(1, "k"), (2, "k"), (3, "k")], "left_id long, blk string"
    )
    recs_r = recs.withColumnRenamed("left_id", "right_id")
    got2 = {
        (r["left_id"], r["right_id"])
        for r in union_blocking(recs, recs_r, ["blk"], mode="dedupe").collect()
    }
    assert got2 == {(1, 2), (1, 3), (2, 3)}


def test_union_blocking_pair_scored_once_across_rules(spark):
    from ditto_spark.operators.fellegi import union_blocking

    a = spark.createDataFrame([(1, "k", "s")], "left_id long, blk string, src string")
    b = spark.createDataFrame([(2, "k", "s")], "right_id long, blk string, src string")
    rows = union_blocking(a, b, ["blk", "src"], mode="link").collect()
    assert len(rows) == 1  # both rules fire; pair emitted once


def test_union_blocking_empty_rules_raises(spark):
    from ditto_spark.operators.fellegi import union_blocking

    a = spark.createDataFrame([(1, "k")], "left_id long, blk string")
    b = spark.createDataFrame([(2, "k")], "right_id long, blk string")
    with pytest.raises(ValueError, match="blocking rule"):
        union_blocking(a, b, [])


def test_comparison_vectors_keep_left_non_field_column(spark):
    from ditto_spark.operators.fellegi import (
        FieldComparison,
        comparison_vectors,
        exact_gamma,
    )

    a = spark.createDataFrame(
        [(1, "k", "x", "extra-a")], "left_id long, blk string, f string, note string"
    )
    b = spark.createDataFrame(
        [(2, "k", "x", "extra-b")], "right_id long, blk string, f string, note string"
    )
    rows = comparison_vectors(
        a, b, "blk", [FieldComparison("f", 2, exact_gamma())], keep_left=("note",)
    ).collect()
    assert rows[0]["note"] == "extra-a"
    assert rows[0]["gamma_f"] == 1


def test_blocking_rule_profile_counts(spark):
    import pyspark.sql.functions as F
    from ditto_spark.operators.fellegi import blocking_rule_profile

    a = spark.createDataFrame(
        [(1, "x", "p"), (2, "y", "p"), (3, "z", "q")],
        "left_id long, k1 string, k2 string",
    )
    b = spark.createDataFrame(
        [(10, "x", "p"), (11, "y", "r"), (12, "w", "q")],
        "right_id long, k1 string, k2 string",
    )
    # rule0 (k1): (1,10), (2,11); rule1 (k2): (1,10), (2,10), (3,12)
    out = {
        r["rule_name"]: r
        for r in blocking_rule_profile(
            a, b, [F.col("k1"), F.col("k2")], ["k1", "k2"]
        ).collect()
    }
    assert out["k1"]["n_pairs"] == 2 and out["k1"]["n_new"] == 2
    assert out["k1"]["n_exclusive"] == 1  # (2,11) only via k1
    assert out["k2"]["n_pairs"] == 3
    assert out["k2"]["n_new"] == 2  # (2,10), (3,12); (1,10) already via k1
    assert out["k2"]["n_exclusive"] == 2


def test_blocking_rule_profile_null_keys_never_join(spark):
    import pyspark.sql.functions as F
    from ditto_spark.operators.fellegi import blocking_rule_profile

    a = spark.createDataFrame([(1, None)], "left_id long, k string")
    b = spark.createDataFrame([(2, None)], "right_id long, k string")
    assert blocking_rule_profile(a, b, [F.col("k")]).count() == 0


def test_fs_explain_waterfall_decomposition(spark):
    """fs_explain's per-term rows reconstruct fs_score exactly: the prior
    row carries the prior log-odds, each field row carries its level's
    log2 Bayes factor, contributions sum to the pair's match_weight, the
    running weight walks the same path, and the repeated posterior equals
    fs_score's (no TF adjustment here)."""
    from ditto_spark.operators.fellegi import fs_explain

    fields = [
        FieldComparison("name", 3, exact_fuzzy_gamma(max_dist=1)),
        FieldComparison("city", 2, exact_gamma()),
    ]
    params = {
        "name": ([0.05, 0.15, 0.8], [0.9, 0.08, 0.02]),
        "city": ([0.2, 0.8], [0.7, 0.3]),
    }
    prior = 0.2
    a = spark.createDataFrame(
        [(1, "b", "anna", "oslo"), (2, "b", "bert", "rome")],
        "left_id int, blk string, name string, city string",
    )
    b = spark.createDataFrame(
        [(10, "b", "anna", "oslo"), (11, "b", "berd", "lima")],
        "right_id int, blk string, name string, city string",
    )
    gam = comparison_vectors(a, b, "blk", fields)
    expl = fs_explain(gam, fields, params, prior).collect()
    scored = {
        (r["left_id"], r["right_id"]): r
        for r in fs_score(gam, fields, params, prior).collect()
    }
    by_pair = {}
    for r in expl:
        by_pair.setdefault((r["left_id"], r["right_id"]), []).append(r)
    assert set(by_pair) == set(scored) and len(by_pair) == 4
    prior_w = math.log2(prior / (1 - prior))
    for key, rows in by_pair.items():
        rows.sort(key=lambda r: r["step"])
        assert [r["term"] for r in rows] == ["prior", "name", "city"]
        assert rows[0]["gamma_level"] is None
        assert abs(rows[0]["contribution"] - prior_w) < 1e-12
        total = sum(r["contribution"] for r in rows)
        assert abs(total - scored[key]["match_weight"]) < 1e-9
        run = prior_w
        for r in rows[1:]:
            run += r["contribution"]
            assert abs(r["running_weight"] - run) < 1e-9
        for r in rows:
            assert abs(r["posterior"] - scored[key]["posterior"]) < 1e-9
    # spot-check one known contribution: exact-match name (gamma 2)
    exact_name = [
        r for r in by_pair[(1, 10)] if r["term"] == "name"
    ][0]
    assert exact_name["gamma_level"] == 2
    want = math.log2((0.8 + 1e-9) / (0.02 + 1e-9))
    assert abs(exact_name["contribution"] - want) < 1e-9


def test_estimate_u_random_matches_bruteforce(spark):
    """u marginals equal an independent Python brute force over the SAME
    deterministic md5 sample: sampling rule, gamma levels, Laplace
    smoothing, and the full (field, level) grid incl. never-observed
    levels."""
    import hashlib

    from ditto_spark.operators.fellegi import estimate_u_random

    fields = [
        FieldComparison("src", 2, exact_gamma()),
        FieldComparison("ln", 3, numeric_band_gamma(tight=5, loose=20)),
    ]
    rows_a = [(i, f"s{i % 4}", 10 * i) for i in range(40)]
    rows_b = [(j, f"s{j % 4}", 10 * j + 3) for j in range(35)]
    a = spark.createDataFrame(rows_a, "left_id int, src string, ln int")
    b = spark.createDataFrame(rows_b, "right_id int, src string, ln int")
    target, seed, alpha = 400, 17, 0.5
    got = {
        (r["field"], r["gamma_level"]): r["u_prob"]
        for r in estimate_u_random(
            a, b, fields, target_pairs=target, seed=seed, alpha=alpha
        ).collect()
    }
    assert set(got) == {("src", 0), ("src", 1)} | {
        ("ln", k) for k in range(3)
    }

    rate = min(1.0, (target / (len(rows_a) * len(rows_b))) ** 0.5)

    def keep(tag, rid):
        h = hashlib.md5(f"{seed}:{tag}:{rid}".encode()).hexdigest()[:6]
        return int(h, 16) / float(1 << 24) < rate

    sa = [r for r in rows_a if keep("a", r[0])]
    sb = [r for r in rows_b if keep("b", r[0])]
    tot = len(sa) * len(sb)
    assert tot > 50  # the sample is real
    cnt = {}
    for _, asrc, aln in sa:
        for _, bsrc, bln in sb:
            g_src = 1 if asrc == bsrc else 0
            d = abs(aln - bln)
            g_ln = 2 if d <= 5 else (1 if d <= 20 else 0)
            cnt[("src", g_src)] = cnt.get(("src", g_src), 0) + 1
            cnt[("ln", g_ln)] = cnt.get(("ln", g_ln), 0) + 1
    for (fname, lv), u in got.items():
        levels = 2 if fname == "src" else 3
        want = (cnt.get((fname, lv), 0) + alpha) / (tot + alpha * levels)
        assert abs(u - want) < 1e-12, f"{fname}/{lv}: {u} vs {want}"
    # random-pair src agreement ~ 1/4 (uniform over 4 sources)
    assert abs(got[("src", 1)] - 0.25) < 0.1
    # determinism
    again = {
        (r["field"], r["gamma_level"]): r["u_prob"]
        for r in estimate_u_random(
            a, b, fields, target_pairs=target, seed=seed, alpha=alpha
        ).collect()
    }
    assert again == got


def test_estimate_m_from_labels_marginals(spark):
    """m marginals over labeled matches: hand-checked Laplace-smoothed
    counts, full grid incl. a never-observed level, non-matches ignored."""
    from ditto_spark.operators.fellegi import estimate_m_from_labels

    fields = [
        FieldComparison("name", 3, exact_fuzzy_gamma()),
        FieldComparison("city", 2, exact_gamma()),
    ]
    gam = spark.createDataFrame(
        # (gamma_name, gamma_city, label): 4 matches, 2 non-matches
        [(2, 1, 1), (2, 1, 1), (1, 1, 1), (2, 0, 1), (0, 0, 0), (1, 0, 0)],
        "gamma_name int, gamma_city int, label int",
    )
    got = {
        (r["field"], r["gamma_level"]): r["m_prob"]
        for r in estimate_m_from_labels(gam, fields, alpha=0.5).collect()
    }
    tot = 4
    want = {
        ("name", 0): 0.5 / (tot + 1.5),        # never observed in matches
        ("name", 1): 1.5 / (tot + 1.5),
        ("name", 2): 3.5 / (tot + 1.5),
        ("city", 0): 1.5 / (tot + 1.0),
        ("city", 1): 3.5 / (tot + 1.0),
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, k


def test_supervised_m_sampled_u_scoring_roundtrip(spark):
    """Integration of the estimation split: m from labeled matches, u from
    random pairs, assembled into fs_score — planted duplicates score far
    above planted non-matches, and posterior separates them cleanly at
    0.5."""
    from ditto_spark.operators.fellegi import (
        estimate_m_from_labels,
        estimate_u_random,
        fs_score,
        params_from_estimates,
    )

    fields = [
        FieldComparison("name", 3, exact_fuzzy_gamma(max_dist=1)),
        FieldComparison("city", 2, exact_gamma()),
    ]
    # corpus: 30 records per side; i == j is a true match (same name
    # modulo a 1-char typo on every 5th, same city); off-diagonal shares
    # city 1/3 of the time
    def name(i):
        # distinct-i names differ in >=2 chars, so random pairs never sit
        # inside the fuzzy level and gamma=1 stays match-informative
        return f"entity-{i * 13 % 997:03d}-{i:03d}"

    a = spark.createDataFrame(
        [(i, "b", name(i), f"c{i % 3}") for i in range(30)],
        "left_id int, blk string, name string, city string",
    )
    b = spark.createDataFrame(
        [
            (j, "b", (name(j) if j % 5 else name(j)[:-1]), f"c{j % 3}")
            for j in range(30)
        ],
        "right_id int, blk string, name string, city string",
    )
    gam = comparison_vectors(a, b, "blk", fields)
    labeled = gam.withColumn(
        "label", (F.col("left_id") == F.col("right_id")).cast("int")
    )
    m_df = estimate_m_from_labels(labeled, fields)
    u_df = estimate_u_random(a, b, fields, sample_rate=1.0)
    params = params_from_estimates(m_df, u_df, fields)
    scored = fs_score(gam, fields, params, prior=1.0 / 30.0)
    rows = scored.collect()
    pos = [r["posterior"] for r in rows if r["left_id"] == r["right_id"]]
    neg = [r["posterior"] for r in rows if r["left_id"] != r["right_id"]]
    assert min(pos) > 0.5 > max(neg)


def test_null_aware_gamma_missing_is_uninformative(spark):
    """null_aware: a NULL on either side -> level -1; fs_score gives it
    weight 0 (identical posterior to not comparing the field at all);
    estimate_fs / estimate_u_random / estimate_m_from_labels exclude it
    from marginals. Without the wrapper, NULLs fall to the disagreement
    weight — the bias this exists to kill."""
    from ditto_spark.operators.fellegi import (
        estimate_m_from_labels,
        estimate_u_random,
        fs_score,
        null_aware,
    )

    fields = [
        FieldComparison("name", 3, exact_fuzzy_gamma(max_dist=1)),
        FieldComparison("city", 2, null_aware(exact_gamma())),
    ]
    a = spark.createDataFrame(
        [(1, "b", "anna", "oslo"), (2, "b", "bert", None)],
        "left_id int, blk string, name string, city string",
    )
    b = spark.createDataFrame(
        [(10, "b", "anna", "oslo"), (11, "b", "bert", None)],
        "right_id int, blk string, name string, city string",
    )
    gam = comparison_vectors(a, b, "blk", fields)
    lv = {
        (r["left_id"], r["right_id"]): r["gamma_city"] for r in gam.collect()
    }
    assert lv[(2, 11)] == -1 and lv[(1, 11)] == -1 and lv[(1, 10)] == 1

    params = {
        "name": ([0.05, 0.15, 0.8], [0.9, 0.08, 0.02]),
        "city": ([0.2, 0.8], [0.7, 0.3]),
    }
    scored = {
        (r["left_id"], r["right_id"]): r["match_weight"]
        for r in fs_score(gam, fields, params, prior=0.5).collect()
    }
    # pair (2,11): exact name, missing city -> weight = name weight only
    name_only = fs_score(
        gam, fields[:1], {"name": params["name"]}, prior=0.5
    )
    w_name = {
        (r["left_id"], r["right_id"]): r["match_weight"]
        for r in name_only.collect()
    }
    assert abs(scored[(2, 11)] - w_name[(2, 11)]) < 1e-12

    # marginals: city u/m totals count only the observed (1,10) pair family
    u_df = estimate_u_random(a, b, fields, sample_rate=1.0)
    u = {
        (r["field"], r["gamma_level"]): r["u_prob"] for r in u_df.collect()
    }
    # observed city comparisons: (1,10) agree, (2,10)... city null on 2 ->
    # only pairs with BOTH cities present: (1,10) agree => cnt {1:1}, tot 1
    assert abs(u[("city", 1)] - (1 + 0.5) / (1 + 1.0)) < 1e-12
    assert abs(u[("city", 0)] - 0.5 / (1 + 1.0)) < 1e-12
    lab = gam.withColumn(
        "label", (F.col("left_id") == F.col("right_id") - 9).cast("int")
    )
    m_df = estimate_m_from_labels(lab, fields)
    m = {
        (r["field"], r["gamma_level"]): r["m_prob"] for r in m_df.collect()
    }
    # matches: (1,10) city observed-agree; (2,11) city missing -> tot 1
    assert abs(m[("city", 1)] - (1 + 0.5) / (1 + 1.0)) < 1e-12
