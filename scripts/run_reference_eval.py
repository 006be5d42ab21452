#!/usr/bin/env python
"""Run the reference's OWN evaluation protocol on its OWN labeled datasets.

Consumes the ER-Magellan pair TSVs shipped inside the reference repo
(pre-serialized COL/VAL entries, `left\\tright\\tlabel` — the exact files
Ditto's matcher trains/evaluates on, /root/reference/data/er_magellan/...),
through our pipeline's components:

  read_pairs_tsv (S1) → pairwise scorer (Arrow-UDF cosine surrogate or
  pure-JVM Jaccard) → τ tuned on valid via the distributed grid sweep
  (M4, strict p > τ, argmax F1, ties → lowest τ) → confusion F1 on test
  (A1, f1.py:9-19 semantics).

The sandbox has no torch/transformers, so the scorer is the deterministic
lexical surrogate — the point is protocol parity (same files, same
tune-then-test flow, same metric), not matching the fine-tuned LM's F1;
`cross_encoder_scorer_factory` drops into the same slot when weights exist.
Prints one JSON line per dataset plus a summary table.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/data/er_magellan"

# reference's 5-run-mean fine-tuned-LM F1s (old_misc/
# ditto_results_summary_cleaned.csv) for context in the output table
REFERENCE_LM_F1 = {
    "Structured/Beer": 0.7928,
    "Structured/Fodors-Zagats": 0.9867,
    "Structured/iTunes-Amazon": 0.9495,
    "Structured/DBLP-ACM": 0.9861,
    "Structured/DBLP-GoogleScholar": 0.9533,
    "Structured/Amazon-Google": 0.7466,
    "Structured/Walmart-Amazon": 0.8244,
}


REF_WDC = "/root/reference/data/wdc"

# reference F1 for wdc xlarge configs (ditto_results_summary_cleaned.csv);
# we evaluate with the small valid split + the shared test split
REFERENCE_LM_F1_WDC = {
    "cameras": 0.9424,
    "computers": 0.9524,
    "shoes": 0.9041,
    "watches": 0.9489,
}


def evaluate_dataset(
    spark,
    name: str,
    use_arrow_udf: bool = True,
    use_idf: bool = True,
    idf_mode: str = "relational",
) -> dict:
    """idf_mode: 'relational' joins the (token, idf) index against exploded
    pair tokens — the corpus-scale path (no driver-side vocabulary);
    'dict' collects the vocabulary into the Arrow-UDF closure — the
    small-vocab fast path. Both produce identical scores (same tokenizer,
    same weights; asserted by tests)."""
    import pyspark.sql.functions as F
    from ditto_spark.sources import read_pairs_tsv
    from ditto_spark.operators.scoring import (
        score_pairs, score_pairs_builtin, apply_threshold,
        build_idf_df, build_idf_dict, idf_weighted_scorer_factory,
        score_pairs_tfidf_relational,
    )
    from ditto_spark.operators.evaluate import tune_threshold, confusion_f1

    def load(split: str):
        if name.startswith("wdc/"):
            cat = name.split("/", 1)[1]
            path = (
                f"{REF_WDC}/{cat}/test.txt" if split == "test"
                else f"{REF_WDC}/{cat}/valid.txt.small"
            )
        else:
            path = f"{REF}/{name}/{split}.txt"
        df = read_pairs_tsv(spark, path)
        # scorer contract wants ids; the TSVs are positional. Ids must be
        # DETERMINISTIC (monotonically_increasing_id changes with plan
        # re-execution — one .unpersist() away from silent row misalignment
        # in the score↔label rejoin): row_number over a stable sort of the
        # full row. Single-partition window is fine at eval-set size.
        from pyspark.sql import Window

        w = Window.orderBy("left_txt", "right_txt", "label")
        rn = F.row_number().over(w).cast("string")
        return df.withColumn("left_id", rn).withColumn(
            "right_id", F.concat(F.lit("r"), rn)
        )

    valid_raw = load("valid").persist()
    test_raw = load("test").persist()

    factory = None
    idf_df = None
    if use_arrow_udf and use_idf:
        # corpus IDF over the distinct entity texts of both splits — the
        # surrogate analogue of the reference's summarizer index
        texts = (
            valid_raw.select(F.col("left_txt").alias("txt"))
            .unionByName(valid_raw.select(F.col("right_txt").alias("txt")))
            .unionByName(test_raw.select(F.col("left_txt").alias("txt")))
            .unionByName(test_raw.select(F.col("right_txt").alias("txt")))
            .distinct()
        )
        if idf_mode == "relational":
            idf_df = build_idf_df(texts).persist()
        else:
            factory = idf_weighted_scorer_factory(build_idf_dict(texts))

    def score(df):
        if idf_df is not None:
            scored = score_pairs_tfidf_relational(df, idf_df)
        elif use_arrow_udf:
            scored = score_pairs(df, scorer_factory=factory)
        else:
            scored = score_pairs_builtin(df)
        return scored.join(
            df.select("left_id", "right_id", "label"), ["left_id", "right_id"]
        )

    valid = score(valid_raw).persist()
    tau = tune_threshold(valid)
    test = score(test_raw)
    decided = apply_threshold(test, tau)
    m = confusion_f1(decided).collect()[0]
    valid.unpersist()
    return {
        "dataset": name,
        "tau": tau,
        "f1": round(m["f1"], 4),
        "precision": round(m["precision"], 4),
        "recall": round(m["recall"], 4),
        "tp": m["tp"], "fp": m["fp"], "fn": m["fn"], "tn": m["tn"],
        "reference_lm_f1": REFERENCE_LM_F1.get(name)
        or REFERENCE_LM_F1_WDC.get(name.split("/", 1)[-1]),
    }


def main() -> None:
    from ditto_spark.session import get_spark

    spark = get_spark("reference_eval")
    datasets = [
        d for d in sorted(REFERENCE_LM_F1)
        if os.path.exists(f"{REF}/{d}/valid.txt")
    ] + [
        f"wdc/{c}" for c in sorted(REFERENCE_LM_F1_WDC)
        if os.path.exists(f"{REF_WDC}/{c}/test.txt")
    ]
    results = []
    for name in datasets:
        r = evaluate_dataset(spark, name)
        print(json.dumps(r), flush=True)
        results.append(r)
    print("\n| dataset | surrogate F1 | tuned tau | reference LM F1 |")
    print("|---|---|---|---|")
    for r in results:
        print(f"| {r['dataset']} | {r['f1']} | {r['tau']:.2f} | {r['reference_lm_f1']} |")
    spark.stop()




# --------------------------------------------------------------- FS eval
#
# Unsupervised Fellegi-Sunter on the reference's own labeled pairs: parse
# the COL/VAL attributes back out of the serialized entries, build 4-level
# gamma vectors per attribute (3 exact / 2 fuzzy token-jaccard / 1
# disagree / 0 missing — EM learns m≈u for the missing level, so absent
# attributes carry ~zero weight), fit EM on valid+test gammas WITHOUT
# looking at labels, score, threshold at posterior 0.5, report test F1.
# This is the classical-baseline column next to the lexical surrogate and
# the reference's fine-tuned LM.

import re as _re


def _dataset_attributes(df, max_attrs: int = 5) -> list[str]:
    """Most frequent COL names across left entries (driver-side: the name
    set is schema-sized, not data-sized)."""
    import pyspark.sql.functions as F

    rows = (
        df.select(
            F.explode(
                F.expr(r"regexp_extract_all(left_txt, 'COL (\\S+) VAL', 1)")
            ).alias("a")
        )
        .groupBy("a")
        .count()
        .orderBy(F.col("count").desc(), F.col("a"))
        .take(max_attrs)
    )
    return [r["a"] for r in rows]


def _attr_gammas(df, attrs: list[str]):
    """4-level gamma per attribute, all Catalyst expressions."""
    import pyspark.sql.functions as F

    out = df
    for a in attrs:
        pat = f"COL {_re.escape(a)} VAL (.*?)(?= COL \\S+ VAL|$)"
        lv = F.trim(F.regexp_extract("left_txt", pat, 1))
        rv = F.trim(F.regexp_extract("right_txt", pat, 1))
        lt = F.array_distinct(F.filter(F.split(lv, " "), lambda x: x != ""))
        rt = F.array_distinct(F.filter(F.split(rv, " "), lambda x: x != ""))
        inter = F.size(F.array_intersect(lt, rt)).cast("double")
        union = (F.size(lt) + F.size(rt)).cast("double") - inter
        jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
        gamma = (
            F.when((lv == "") | (rv == ""), F.lit(0))
            .when(lv == rv, F.lit(3))
            .when(jac >= 0.5, F.lit(2))
            .otherwise(F.lit(1))
        )
        out = out.withColumn(f"gamma_a{attrs.index(a)}", gamma.cast("int"))
    return out


def fs_evaluate_dataset(spark, name: str, iters: int = 25) -> dict:
    import pyspark.sql.functions as F
    from ditto_spark.operators.evaluate import confusion_f1
    from ditto_spark.operators.fellegi import (
        FieldComparison,
        estimate_fs,
        fs_score,
    )
    from ditto_spark.sources import read_pairs_tsv
    from pyspark.sql import Window

    def load(split):
        df = read_pairs_tsv(spark, f"{REF}/{name}/{split}.txt")
        w = Window.orderBy("left_txt", "right_txt", "label")
        rn = F.row_number().over(w).cast("string")
        return df.withColumn("left_id", rn).withColumn(
            "right_id", F.concat(F.lit("r"), rn)
        )

    valid = load("valid")
    test = load("test").persist()
    attrs = _dataset_attributes(valid)
    fields = [
        FieldComparison(f"a{i}", 4, lambda l, r: F.lit(0))  # gamma precomputed
        for i in range(len(attrs))
    ]
    gam_all = _attr_gammas(valid.unionByName(test), attrs).select(
        "left_id", "right_id", *[f"gamma_a{i}" for i in range(len(attrs))]
    )
    # u-init from the empirical gamma marginals — the analogue of Splink's
    # estimate_u_using_random_sampling (most pairs are non-matches, so the
    # pooled marginal approximates the non-match distribution); keeps EM
    # out of the degenerate lambda≈0.5 mode on the dirty product datasets.
    # ALL marginals come from ONE aggregate over the persisted gammas —
    # a per-attribute groupBy loop would recompute the regexp extraction
    # pipeline once per attribute.
    gam_all = gam_all.persist()
    k = len(attrs)
    row = gam_all.agg(
        *[
            F.count(F.when(F.col(f"gamma_a{i}") == lvl, 1)).alias(f"c_{i}_{lvl}")
            for i in range(k)
            for lvl in range(4)
        ]
    ).collect()[0]
    init = {}
    for i in range(k):
        cnts = [row[f"c_{i}_{lvl}"] for lvl in range(4)]
        tot = sum(cnts)
        u0 = [max(c / tot, 1e-4) for c in cnts]
        s = sum(u0)
        init[f"a{i}"] = ([0.05, 0.1, 0.15, 0.7], [x / s for x in u0])
    est = estimate_fs(gam_all, fields, iters=iters, prior=0.1, init=init)
    gam_all.unpersist()  # estimate_fs collected its histogram eagerly
    rows = est.collect()
    lam = rows[0]["prior_match"]
    params = {
        f.name: (
            [r["m_prob"] for r in rows if r["field"] == f.name],
            [r["u_prob"] for r in rows if r["field"] == f.name],
        )
        for f in fields
    }
    gam_test = _attr_gammas(test, attrs).select(
        "left_id", "right_id", "label",
        *[f"gamma_a{i}" for i in range(len(attrs))],
    )
    scored = fs_score(gam_test, fields, params, prior=lam)
    decided = scored.join(
        gam_test.select("left_id", "right_id", "label"), ["left_id", "right_id"]
    ).withColumn("match", (F.col("posterior") > 0.5).cast("int"))
    m = confusion_f1(decided).collect()[0]
    test.unpersist()
    return {
        "dataset": name,
        "fs_f1": round(m["f1"], 4),
        "fs_precision": round(m["precision"], 4),
        "fs_recall": round(m["recall"], 4),
        "fs_lambda": round(lam, 4),
        "attrs": attrs,
        "reference_lm_f1": REFERENCE_LM_F1.get(name),
    }


def fs_main() -> None:
    from ditto_spark.session import get_spark

    spark = get_spark("reference_eval_fs")
    datasets = [
        d for d in sorted(REFERENCE_LM_F1)
        if os.path.exists(f"{REF}/{d}/valid.txt")
    ]
    results = []
    for name in datasets:
        r = fs_evaluate_dataset(spark, name)
        print(json.dumps(r), flush=True)
        results.append(r)
    print("\n| dataset | FS F1 (unsupervised) | lambda | reference LM F1 |")
    print("|---|---|---|---|")
    for r in results:
        print(
            f"| {r['dataset']} | {r['fs_f1']} | {r['fs_lambda']} "
            f"| {r['reference_lm_f1']} |"
        )
    spark.stop()


if __name__ == "__main__":
    if "--fs" in sys.argv:
        fs_main()
    else:
        main()
