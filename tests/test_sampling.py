import hashlib

import pyspark.sql.functions as F
import pytest

from ditto_spark.operators.sampling import quota_sample, strip_boilerplate_lines


def _expected_quota(rows, group_idx, id_idx, k, seed=17):
    """Reference top-k per group by (md5(seed:id), id)."""
    by_group = {}
    for r in rows:
        key = hashlib.md5(f"{seed}:{r[id_idx]}".encode()).hexdigest()
        by_group.setdefault(r[group_idx], []).append((key, r[id_idx]))
    out = {}
    for g, items in by_group.items():
        items.sort()
        out[g] = [i for _, i in items[:k]]
    return out


@pytest.fixture(scope="module")
def docs(spark):
    # 3 sources with very different sizes (one "skewed" group) + one tiny
    rows = (
        [(f"a{i:03d}", "src_big", f"text {i}") for i in range(200)]
        + [(f"b{i:03d}", "src_mid", f"text {i}") for i in range(40)]
        + [("c000", "src_one", "solo")]
    )
    return spark.createDataFrame(rows, "doc_id string, source string, text string")


def test_quota_sample_exact_topk_per_group(spark, docs):
    got = quota_sample(docs, "source", k=10, id_col="doc_id").collect()
    exp = _expected_quota([(r.doc_id, r.source) for r in docs.collect()], 1, 0, 10)
    by_group = {}
    for r in got:
        by_group.setdefault(r.source, []).append((r.smp_rank, r.doc_id))
    assert set(by_group) == set(exp)
    for g, pairs in by_group.items():
        pairs.sort()
        assert [d for _, d in pairs] == exp[g]
        assert [rk for rk, _ in pairs] == list(range(1, len(pairs) + 1))


def test_quota_sample_prefilter_matches_plain_window(spark, docs):
    a = quota_sample(docs, "source", k=7, prefilter=True)
    b = quota_sample(docs, "source", k=7, prefilter=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_quota_sample_small_groups_kept_whole(spark, docs):
    got = quota_sample(docs, "source", k=10).where(F.col("source") == "src_one")
    assert [r.doc_id for r in got.collect()] == ["c000"]


def test_quota_sample_partition_invariant(spark, docs):
    a = sorted(map(tuple, quota_sample(docs, "source", 5).collect()))
    b = sorted(map(tuple, quota_sample(docs.repartition(13), "source", 5).collect()))
    assert a == b


def test_quota_sample_fallback_path_exact(spark, docs, monkeypatch):
    # Force the prefilter to under-select by shrinking the margin to ~0:
    # every group becomes deficient and the lazy exact-fallback branch must
    # reproduce the plain-window answer on its own.
    import ditto_spark.operators.sampling as S

    real_least = F.least

    def tiny_least(a, b):  # replace min(1, margin/n) with ~margin*1e-9/n
        return real_least(a * 1e-9, b * 1e-9)

    monkeypatch.setattr(S.F, "least", tiny_least)
    got = sorted(map(tuple, quota_sample(docs, "source", 6).collect()))
    monkeypatch.undo()
    exp = sorted(map(tuple, quota_sample(docs, "source", 6, prefilter=False).collect()))
    assert got == exp


def test_strip_boilerplate_removes_frequent_lines(spark):
    docs = spark.createDataFrame(
        [
            ("d1", "COOKIE BANNER\nunique one\nfooter"),
            ("d2", "COOKIE BANNER\nunique two\nfooter"),
            ("d3", "all original\nhere"),
        ],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in strip_boilerplate_lines(docs, 2).collect()}
    assert out["d1"].clean_text == "unique one"
    assert out["d1"].n_kept == 1 and out["d1"].n_removed == 2
    assert out["d2"].clean_text == "unique two"
    assert out["d3"].clean_text == "all original\nhere"
    assert out["d3"].n_removed == 0


def test_strip_boilerplate_within_doc_repeat_not_boilerplate(spark):
    # the same line twice in ONE doc is distinct-doc-freq 1 -> kept
    docs = spark.createDataFrame(
        [("d1", "la\nla"), ("d2", "other")], "doc_id string, text string"
    )
    out = {r.doc_id: r for r in strip_boilerplate_lines(docs, 2).collect()}
    assert out["d1"].clean_text == "la\nla"


def test_strip_boilerplate_order_and_empty_doc(spark):
    docs = spark.createDataFrame(
        [("d1", "same\nsame2"), ("d2", "same\nsame2"), ("d3", "z\nsame\na")],
        "doc_id string, text string",
    )
    out = {r.doc_id: r for r in strip_boilerplate_lines(docs, 2).collect()}
    assert out["d1"].clean_text == "" and out["d1"].n_kept == 0
    assert out["d1"].n_removed == 2
    # intra-doc order restored (z before a), not sorted alphabetically
    assert out["d3"].clean_text == "z\na"


def test_strip_boilerplate_partition_invariant(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", ("common\n" if i % 2 else "") + f"u{i}") for i in range(30)],
        "doc_id string, text string",
    )
    a = sorted(map(tuple, strip_boilerplate_lines(docs, 2).collect()))
    b = sorted(map(tuple, strip_boilerplate_lines(docs.repartition(7), 2).collect()))
    assert a == b


def test_quota_sample_null_group_parity(spark):
    """NULL group values are a group like any other: both prefilter paths
    must keep them (a plain equi-join on the group col would silently drop
    every NULL-group row from the prefilter path)."""
    rows = [("d1", None), ("d2", None), ("d3", "g"), ("d4", None), ("d5", "g")]
    df = spark.createDataFrame(rows, "doc_id string, src string")
    got_pre = quota_sample(df, "src", k=2, prefilter=True)
    got_exact = quota_sample(df, "src", k=2, prefilter=False)
    pre = sorted((r["doc_id"], r["src"]) for r in got_pre.collect())
    exact = sorted((r["doc_id"], r["src"]) for r in got_exact.collect())
    assert pre == exact
    assert sum(1 for _, s in pre if s is None) == 2  # NULL group kept its quota


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Split keyed by cluster id: every member of a near-dup cluster lands
    in the same split, and split fractions stay near the weights."""
    import __spark_entry__ as E
    import pyspark.sql.functions as F

    out = E.q_leakage_safe_split(spark, "/root/testdata/sf0.001").cache()
    # co-cluster co-assignment
    viol = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert viol == 0
    # at least one non-singleton cluster exercises the property
    assert (
        out.groupBy("cluster_id").count().where(F.col("count") > 1).count() > 0
    )
    fr = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    n = sum(fr.values())
    assert 0.6 < fr.get("train", 0) / n < 0.95
    out.unpersist()


def test_clerical_review_sample_strata_and_determinism(spark):
    from ditto_spark.operators.sampling import clerical_review_sample

    import pyspark.sql.functions as F

    pairs = spark.range(2000).select(
        F.col("id").alias("left_id"),
        (F.col("id") + 10000).alias("right_id"),
        ((F.col("id") % 100) / 100.0).alias("score"),
    )
    out = clerical_review_sample(
        pairs, threshold=0.5, width=0.2, bucket_width=0.1, per_bucket=3
    )
    rows = out.collect()
    # window [0.3, 0.7] -> 4 full buckets of width .1 (+ boundary bucket 4)
    assert all(0.3 <= r["score"] <= 0.7 for r in rows)
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert all(len(v) <= 3 for v in by_bucket.values())
    assert all(
        sorted(x["smp_rank"] for x in v) == list(range(1, len(v) + 1))
        for v in by_bucket.values()
    )
    # bucket_lo consistent with the bucket index
    for r in rows:
        assert r["bucket_lo"] == round(0.3 + r["bucket"] * 0.1, 4)
        assert r["bucket_lo"] - 1e-9 <= r["score"]
    # deterministic under repartition
    again = sorted(
        map(tuple, clerical_review_sample(
            pairs.repartition(13), threshold=0.5, width=0.2,
            bucket_width=0.1, per_bucket=3,
        ).collect())
    )
    assert again == sorted(map(tuple, rows))


# --- temperature-based source mixing ---

from ditto_spark.operators.sampling import temperature_mix_sample  # noqa: E402


def _mix_df(spark):
    """Three sources with counts 400 / 100 / 25 (16:4:1)."""
    return spark.range(525).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 400, "big")
        .when(F.col("id") < 500, "mid")
        .otherwise("small")
        .alias("src"),
    )


def test_temperature_mix_alpha_one_keeps_everything(spark):
    df = _mix_df(spark)
    assert temperature_mix_sample(df, "src", "doc_id", alpha=1.0).count() == 525


def test_temperature_mix_smallest_source_kept_whole(spark):
    out = temperature_mix_sample(_mix_df(spark), "src", "doc_id", alpha=0.5)
    per = {r["src"]: r["c"] for r in out.groupBy("src").agg(F.count("*").alias("c")).collect()}
    assert per["small"] == 25  # rate 1 for the min source
    # rate_big = sqrt(25/400) = 0.25, rate_mid = sqrt(25/100) = 0.5
    assert abs(per["big"] - 100) < 40, per
    assert abs(per["mid"] - 50) < 25, per


def test_temperature_mix_alpha_zero_balances(spark):
    out = temperature_mix_sample(_mix_df(spark), "src", "doc_id", alpha=0.0)
    per = {r["src"]: r["c"] for r in out.groupBy("src").agg(F.count("*").alias("c")).collect()}
    # every source downsampled toward n_min = 25
    assert per["small"] == 25
    assert abs(per["big"] - 25) < 20 and abs(per["mid"] - 25) < 15, per


def test_temperature_mix_deterministic_and_partition_invariant(spark):
    df = _mix_df(spark)
    a = sorted(r["doc_id"] for r in temperature_mix_sample(df, "src", "doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_mix_sample(df.repartition(11), "src", "doc_id").collect()
    )
    assert a == b and len(a) > 0


def test_temperature_mix_subset_of_input_no_upsampling(spark):
    df = _mix_df(spark)
    out = temperature_mix_sample(df, "src", "doc_id", alpha=0.3)
    ids = [r["doc_id"] for r in out.select("doc_id").collect()]
    assert len(ids) == len(set(ids))  # no duplication
    assert set(ids) <= set(range(525))


# ---------------------------------------------------------------- DSIR


def _dsir_corpus(spark):
    rows = [
        # target-flavored docs: heavy on "spark sql" grams
        (0, "spark sql join spark sql agg", "t"),
        (1, "spark sql window spark sql", "t"),
        # raw-only flavored docs
        (2, "cat dog bird cat dog", "r"),
        (3, "fish cow horse fish cow", "r"),
        (4, "spark sql cat dog", "r"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "grp"])


def test_hashed_gram_buckets_counts_unigrams_and_bigrams(spark):
    from ditto_spark.operators.sampling import hashed_gram_buckets

    df = spark.createDataFrame([(1, "a b a")], ["doc_id", "text"])
    out = hashed_gram_buckets(df, "text", "doc_id", dim=1024).collect()
    # grams: a, b, a, "a b", "b a" -> 5 total occurrences
    assert sum(r["c"] for r in out) == 5


def test_hashed_gram_buckets_empty_tokens_filtered(spark):
    from ditto_spark.operators.sampling import hashed_gram_buckets

    a = hashed_gram_buckets(
        spark.createDataFrame([(1, "a  b")], ["doc_id", "text"]),
        "text", "doc_id", dim=64,
    ).collect()
    b = hashed_gram_buckets(
        spark.createDataFrame([(1, "a b")], ["doc_id", "text"]),
        "text", "doc_id", dim=64,
    ).collect()
    assert sorted((r["bucket"], r["c"]) for r in a) == sorted(
        (r["bucket"], r["c"]) for r in b
    )


def test_dsir_weights_match_numpy(spark):
    """log_weight must equal the hand-computed hashed-ngram LLR."""
    import hashlib
    import math as m

    from ditto_spark.operators.sampling import (
        dsir_importance_weights,
        dsir_log_ratios,
        hashed_gram_buckets,
    )

    dim, alpha = 32, 1.0
    docs = _dsir_corpus(spark)
    raw_b = hashed_gram_buckets(docs, "text", "doc_id", dim=dim)
    tgt_b = hashed_gram_buckets(
        docs.where(F.col("grp") == "t"), "text", "doc_id", dim=dim
    )
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_importance_weights(
            raw_b, dsir_log_ratios(raw_b, tgt_b, dim=dim, alpha=alpha)
        ).collect()
    }

    def grams(text):
        toks = [t for t in text.split(" ") if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % dim

    rows = _dsir_corpus(spark).collect()
    raw_cnt, tgt_cnt = {}, {}
    for r in rows:
        for g in grams(r["text"]):
            b = bucket(g)
            raw_cnt[b] = raw_cnt.get(b, 0) + 1
            if r["grp"] == "t":
                tgt_cnt[b] = tgt_cnt.get(b, 0) + 1
    R, T = sum(raw_cnt.values()), sum(tgt_cnt.values())
    lr = {
        b: m.log((tgt_cnt.get(b, 0) + alpha) / (T + alpha * dim))
        - m.log((raw_cnt.get(b, 0) + alpha) / (R + alpha * dim))
        for b in range(dim)
    }
    for r in rows:
        want = sum(lr[bucket(g)] for g in grams(r["text"]))
        assert abs(got[r["doc_id"]] - want) < 1e-9, r["doc_id"]
    # target-flavored docs must out-weigh raw-only docs
    assert min(got[0], got[1]) > max(got[2], got[3])


def test_dsir_resample_topk_and_determinism(spark):
    from ditto_spark.operators.sampling import (
        dsir_importance_weights,
        dsir_log_ratios,
        dsir_resample,
        hashed_gram_buckets,
    )

    docs = _dsir_corpus(spark)
    raw_b = hashed_gram_buckets(docs, "text", "doc_id", dim=32)
    tgt_b = hashed_gram_buckets(
        docs.where(F.col("grp") == "t"), "text", "doc_id", dim=32
    )
    w = dsir_importance_weights(raw_b, dsir_log_ratios(raw_b, tgt_b, dim=32))
    out = dsir_resample(w, k=3, seed=29)
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(
        r["doc_id"] for r in dsir_resample(w.repartition(7), k=3, seed=29).collect()
    )
    assert ids1 == ids2 and len(ids1) == 3
    # k >= corpus keeps everything
    assert dsir_resample(w, k=100).count() == 5
    # a different seed may pick a different set but stays deterministic
    s1 = sorted(r["doc_id"] for r in dsir_resample(w, k=3, seed=99).collect())
    s2 = sorted(r["doc_id"] for r in dsir_resample(w, k=3, seed=99).collect())
    assert s1 == s2
