"""Fellegi-Sunter probabilistic record linkage.

Public model: Fellegi & Sunter, "A Theory for Record Linkage" (JASA 1969),
in the m/u match-weight formulation popularised by the open-source Splink
library (github.com/moj-analytical-services/splink): per-field comparison
levels (gamma vectors), EM-estimated m/u probabilities, log2 Bayes-factor
match weights, and term-frequency adjustments for agreement on rare values.

This rounds out the ER-family surface beyond the reference's learned
cross-encoder matcher (/root/reference/ditto_light/ditto.py): the
reference scores pairs with a fine-tuned LM; Fellegi-Sunter is the
classical unsupervised alternative that a record-linkage user of the
reference would expect from a linkage engine, and it is fully
SQL-expressible, so every step is oracle-checked.

Scale design
------------
* Comparison vectors are pure Catalyst expressions (equality,
  ``F.levenshtein``, numeric bands) over blocked pairs — one
  WholeStageCodegen span, zero Python, shuffle sized by the blocker.
* EM state is O(prod(levels)) — at most a few dozen gamma-pattern rows
  regardless of corpus size. The pattern histogram is ONE map-side-
  combinable groupBy; the EM iterations run driver-side on that tiny
  table (same discipline as the crowd solvers: the *data-sized* work is
  a single aggregation, the iterative math touches only the histogram).
* Scoring embeds the per-level log2 weights as Python-computed literals
  (no runtime log in the hot path) and joins at most one value-frequency
  table, which AQE broadcast-upgrades — no extra wide shuffle.
"""

from __future__ import annotations

import math
from collections.abc import Callable
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

__all__ = [
    "FieldComparison",
    "exact_fuzzy_gamma",
    "exact_gamma",
    "numeric_band_gamma",
    "comparison_vectors",
    "estimate_fs",
    "fs_score",
]

_EPS = 1e-9  # weight-smoothing floor, mirrored verbatim in the SQL oracles


@dataclass(frozen=True)
class FieldComparison:
    """One compared field: ``gamma(left, right)`` maps a record pair to an
    integer agreement level in [0, levels), higher = stronger agreement."""

    name: str
    levels: int
    gamma: Callable[[Column, Column], Column]


def exact_fuzzy_gamma(max_dist: int = 2) -> Callable[[Column, Column], Column]:
    """3-level string comparison: 2 exact, 1 within Levenshtein
    ``max_dist`` (a Catalyst expression — no Python), 0 otherwise."""

    def g(left: Column, right: Column) -> Column:
        return (
            F.when(left == right, F.lit(2))
            .when(F.levenshtein(left, right) <= max_dist, F.lit(1))
            .otherwise(F.lit(0))
        )

    return g


def exact_gamma() -> Callable[[Column, Column], Column]:
    """2-level comparison: 1 exact, 0 otherwise."""

    def g(left: Column, right: Column) -> Column:
        return F.when(left == right, F.lit(1)).otherwise(F.lit(0))

    return g


def null_aware(
    inner: Callable[[Column, Column], Column],
) -> Callable[[Column, Column], Column]:
    """Wrap a gamma so a NULL on either side maps to level -1 — the
    Splink-style explicit missing level. A missing value is UNINFORMATIVE
    (weight 0 in fs_score/fs_explain, excluded from estimate_fs /
    estimate_u_random / estimate_m_from_labels marginals), never a
    disagreement: without this, null == null evaluates to NULL and the
    CASE chain silently lands on the full disagreement weight — the
    classic missing-data bias in naive FS implementations."""

    def g(left: Column, right: Column) -> Column:
        return F.when(
            left.isNull() | right.isNull(), F.lit(-1)
        ).otherwise(inner(left, right))

    return g


def numeric_band_gamma(
    tight: float, loose: float
) -> Callable[[Column, Column], Column]:
    """3-level numeric comparison: 2 if |l-r| <= tight, 1 if <= loose."""

    def g(left: Column, right: Column) -> Column:
        d = F.abs(left - right)
        return (
            F.when(d <= tight, F.lit(2))
            .when(d <= loose, F.lit(1))
            .otherwise(F.lit(0))
        )

    return g


def comparison_vectors(
    a: DataFrame,
    b: DataFrame,
    block_col: str,
    fields: list[FieldComparison],
    left_id: str = "left_id",
    right_id: str = "right_id",
    keep_left: tuple[str, ...] = (),
) -> DataFrame:
    """Blocked pair generation + gamma vectors.

    ``a`` / ``b`` carry (id, block_col, *field columns); pairs are the
    block-key equi-join (the caller's blocker bounds block sizes — pair
    with block purging / meta-blocking for skewed keys), and each field's
    gamma is a pure JVM expression. Output: (left_id, right_id,
    *keep_left, gamma_<field> ...).
    """
    fnames = {f.name for f in fields}
    la = a.select(
        F.col(block_col).alias("__blk"),
        F.col(left_id),
        *[F.col(f.name).alias(f"__l_{f.name}") for f in fields],
        # keep_left columns that are not compared fields still come from a
        *[F.col(k).alias(f"__l_{k}") for k in keep_left if k not in fnames],
    )
    rb = b.select(
        F.col(block_col).alias("__blk"),
        F.col(right_id),
        *[F.col(f.name).alias(f"__r_{f.name}") for f in fields],
    )
    pairs = la.join(rb, "__blk")
    return pairs.select(
        F.col(left_id),
        F.col(right_id),
        *[F.col(f"__l_{k}").alias(k) for k in keep_left],
        *[
            f.gamma(F.col(f"__l_{f.name}"), F.col(f"__r_{f.name}"))
            .cast("int")
            .alias(f"gamma_{f.name}")
            for f in fields
        ],
    )


def _default_init(levels: int) -> tuple[list[float], list[float]]:
    """Deterministic m/u starting points: m mass on agreement, u on
    disagreement. Mirrored verbatim by the SQL oracle generator."""
    if levels == 2:
        return [0.2, 0.8], [0.8, 0.2]
    if levels == 3:
        return [0.05, 0.15, 0.8], [0.8, 0.15, 0.05]
    m = [1.0 + 2.0 * i for i in range(levels)]
    u = list(reversed(m))
    return [x / sum(m) for x in m], [x / sum(u) for x in u]


def estimate_fs(
    gammas: DataFrame,
    fields: list[FieldComparison],
    iters: int = 15,
    prior: float = 0.5,
    init: dict[str, tuple[list[float], list[float]]] | None = None,
) -> DataFrame:
    """Unsupervised EM estimation of the Fellegi-Sunter parameters.

    The only data-sized work is one groupBy over the gamma columns
    producing the pattern histogram (<= prod(levels) rows — e.g. 18 for
    three fields of 3/2/3 levels — independent of corpus size); EM then
    iterates driver-side on that histogram with fixed ``iters`` rounds
    (deterministic, so the DuckDB oracle unrolls the identical updates).

    Returns one row per (field, gamma_level): m_prob, u_prob,
    match_weight = log2((m+eps)/(u+eps)), prior_match (the estimated
    overall match proportion lambda, repeated on every row).
    """
    import numpy as np

    gcols = [f"gamma_{f.name}" for f in fields]
    pat = (
        gammas.groupBy(*gcols)
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .collect()
    )
    if not pat:
        raise ValueError("estimate_fs: empty gamma input")
    G = np.array([[r[g] for g in gcols] for r in pat], dtype=np.int64)
    c = np.array([r["c"] for r in pat], dtype=np.float64)

    m: dict[str, np.ndarray] = {}
    u: dict[str, np.ndarray] = {}
    for f in fields:
        m0, u0 = (init or {}).get(f.name) or _default_init(f.levels)
        m[f.name] = np.asarray(m0, dtype=np.float64)
        u[f.name] = np.asarray(u0, dtype=np.float64)
    lam = float(prior)

    obs = G >= 0  # level -1 = missing (null_aware): uninformative
    Gc = np.where(obs, G, 0)  # safe index; masked out below
    for _ in range(iters):
        num = np.full(len(c), lam)
        den_u = np.full(len(c), 1.0 - lam)
        for i, f in enumerate(fields):
            num = num * np.where(obs[:, i], m[f.name][Gc[:, i]], 1.0)
            den_u = den_u * np.where(obs[:, i], u[f.name][Gc[:, i]], 1.0)
        w = num / (num + den_u)
        wm = w * c
        wu = (1.0 - w) * c
        lam = float(wm.sum() / c.sum())
        for i, f in enumerate(fields):
            wmi = wm * obs[:, i]
            wui = wu * obs[:, i]
            m[f.name] = np.bincount(
                Gc[:, i], weights=wmi, minlength=f.levels
            ) / wmi.sum()
            u[f.name] = np.bincount(
                Gc[:, i], weights=wui, minlength=f.levels
            ) / wui.sum()

    spark = gammas.sparkSession
    rows = [
        (
            f.name,
            lvl,
            float(m[f.name][lvl]),
            float(u[f.name][lvl]),
            math.log2((m[f.name][lvl] + _EPS) / (u[f.name][lvl] + _EPS)),
            lam,
        )
        for f in fields
        for lvl in range(f.levels)
    ]
    return spark.createDataFrame(
        rows,
        "field string, gamma_level int, m_prob double, u_prob double, "
        "match_weight double, prior_match double",
    )


def fs_score(
    gammas: DataFrame,
    fields: list[FieldComparison],
    params: dict[str, tuple[list[float], list[float]]],
    prior: float,
    tf_field: str | None = None,
    tf_df: DataFrame | None = None,
    tf_value_col: str | None = None,
) -> DataFrame:
    """Match weight + posterior for each gamma vector.

    ``params[field] = (m_levels, u_levels)``. Per-level log2 weights are
    computed in Python and embedded as literals, so the whole score is a
    CASE chain inside one codegen span. Optional Splink-style term-
    frequency adjustment: for pairs agreeing exactly on ``tf_field``
    (top gamma level), the generic u is replaced by the value-specific
    frequency — adjustment = log2(u_top) - log2(tf(value)) — via a join
    to ``tf_df`` (tf_value_col, tf), broadcast-sized by construction
    (one row per distinct value of one field).

    Output: (left_id, right_id, match_weight, tf_adj, posterior) where
    match_weight includes the prior log-odds term, posterior =
    2^W / (1 + 2^W) with W = match_weight + tf_adj.
    """
    w: Column = F.lit(math.log2(prior / (1.0 - prior)))
    for f in fields:
        mv, uv = params[f.name]
        lvl_w = [
            math.log2((mv[i] + _EPS) / (uv[i] + _EPS)) for i in range(f.levels)
        ]
        expr: Column = F.lit(lvl_w[0])
        for i in range(1, f.levels):
            expr = F.when(F.col(f"gamma_{f.name}") == i, F.lit(lvl_w[i])).otherwise(
                expr
            )
        # missing level (-1, null_aware): uninformative — weight 0
        expr = F.when(F.col(f"gamma_{f.name}") == -1, F.lit(0.0)).otherwise(expr)
        w = w + expr

    out = gammas.withColumn("match_weight", w)
    if tf_field is not None:
        assert tf_df is not None and tf_value_col is not None
        _, uv = params[tf_field]
        top = len(uv) - 1
        out = out.join(
            tf_df.select(F.col(tf_value_col).alias(tf_field), "tf"),
            tf_field,
            "left",
        ).withColumn(
            "tf_adj",
            F.when(
                (F.col(f"gamma_{tf_field}") == top) & F.col("tf").isNotNull(),
                F.lit(math.log2(uv[top] + _EPS)) - F.log2(F.col("tf")),
            ).otherwise(F.lit(0.0)),
        )
    else:
        out = out.withColumn("tf_adj", F.lit(0.0))

    total = F.col("match_weight") + F.col("tf_adj")
    odds = F.pow(F.lit(2.0), total)
    return out.select(
        "left_id",
        "right_id",
        "match_weight",
        "tf_adj",
        (odds / (odds + F.lit(1.0))).alias("posterior"),
    )


def union_blocking(
    a: DataFrame,
    b: DataFrame,
    rules: list[Column | str],
    left_id: str = "left_id",
    right_id: str = "right_id",
    mode: str = "link",
) -> DataFrame:
    """Multi-rule blocking union (Splink's `blocking_rules_to_generate_
    predictions` semantics): each rule is a join-key expression evaluated
    on both sides; candidate pairs are the UNION of the per-rule
    equi-joins, deduplicated on the id pair, so a pair is scored once no
    matter how many rules fire. Rules with null keys on either side
    never join (SQL equi-join null semantics), which is how Splink
    excludes records missing the blocking field.

    ``mode``: "link" (two distinct tables — keep every cross pair, ids
    live in separate namespaces) or "dedupe" (self-join — keep one
    orientation, ``left_id < right_id``, dropping self pairs).

    Scale: each rule is an independent equi-join (no OR-join, which
    Spark would execute as a cartesian + filter); the dedup shuffles
    bare id pairs only. Skewed rule keys get the same treatment as any
    blocker output — purge/salt before the quadratic step, or feed the
    result through meta_blocking_wnp."""
    if mode not in ("link", "dedupe"):
        raise ValueError(f"union_blocking: unknown mode {mode!r}")
    if not rules:
        raise ValueError("union_blocking: at least one blocking rule required")
    outs = []
    for i, rule in enumerate(rules):
        k = F.expr(rule) if isinstance(rule, str) else rule
        la = a.select(F.col(left_id), k.alias("__k")).where(
            F.col("__k").isNotNull()
        )
        rb = b.select(F.col(right_id), k.alias("__k")).where(
            F.col("__k").isNotNull()
        )
        outs.append(la.join(rb, "__k").select(left_id, right_id))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    if mode == "dedupe":
        out = out.where(F.col(left_id) < F.col(right_id))
    return out.dropDuplicates([left_id, right_id])


def blocking_rule_profile(
    a: DataFrame,
    b: DataFrame,
    rules: list[Column | str],
    rule_names: list[str] | None = None,
    left_id: str = "left_id",
    right_id: str = "right_id",
    mode: str = "link",
) -> DataFrame:
    """Per-rule blocking profile (Splink's cumulative-comparisons analysis,
    the tuning loop for `union_blocking`): for each rule, how many candidate
    pairs it generates (n_pairs), how many are NEW after all earlier rules
    (n_new — order-dependent, the marginal cost of adding the rule), and how
    many NO other rule finds (n_exclusive — the recall lost by dropping it).

    One tagged union of per-rule distinct pairs feeds all three statistics:
    per-rule totals from one groupBy(rule); n_new from the pair-level MIN
    rule index; n_exclusive from pairs with exactly one firing rule. Only
    bare (id, id, rule_idx) rows ever shuffle.
    """
    if rule_names is None:
        rule_names = [f"rule_{i}" for i in range(len(rules))]
    if len(rule_names) != len(rules):
        raise ValueError("rule_names must match rules")
    if mode not in ("link", "dedupe"):
        raise ValueError(f"blocking_rule_profile: unknown mode {mode!r}")
    tagged = None
    for i, rule in enumerate(rules):
        k = F.expr(rule) if isinstance(rule, str) else rule
        la = a.select(F.col(left_id), k.alias("__k")).where(F.col("__k").isNotNull())
        rb = b.select(F.col(right_id), k.alias("__k")).where(F.col("__k").isNotNull())
        p = la.join(rb, "__k").select(left_id, right_id)
        if mode == "dedupe":
            p = p.where(F.col(left_id) < F.col(right_id))
        p = p.distinct().withColumn("rule_idx", F.lit(i))
        tagged = p if tagged is None else tagged.unionByName(p)
    totals = tagged.groupBy("rule_idx").agg(F.count(F.lit(1)).alias("n_pairs"))
    pair_level = tagged.groupBy(left_id, right_id).agg(
        F.min("rule_idx").alias("first_rule"),
        F.count(F.lit(1)).alias("n_rules"),
    )
    new = pair_level.groupBy(F.col("first_rule").alias("rule_idx")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    excl = (
        tagged.join(
            pair_level.where(F.col("n_rules") == 1).select(left_id, right_id),
            [left_id, right_id],
        )
        .groupBy("rule_idx")
        .agg(F.count(F.lit(1)).alias("n_exclusive"))
    )
    names = F.array(*[F.lit(n) for n in rule_names])
    return (
        totals.join(new, "rule_idx", "left")
        .join(excl, "rule_idx", "left")
        .select(
            "rule_idx",
            F.element_at(names, F.col("rule_idx") + 1).alias("rule_name"),
            "n_pairs",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.coalesce("n_exclusive", F.lit(0)).alias("n_exclusive"),
        )
    )


def fs_explain(
    gammas: DataFrame,
    fields: list[FieldComparison],
    params: dict[str, tuple[list[float], list[float]]],
    prior: float,
) -> DataFrame:
    """Match-weight waterfall: the per-comparison breakdown behind
    fs_score's single number (Splink's waterfall-chart data — the
    clerical-review view of WHY a pair scored what it did). One output
    row per scoring term per pair:

        step 0            term='prior'   the prior log-odds
        step 1..len(fields)  term=field  that field's log2 Bayes factor
                                         at the pair's gamma level

    with the RUNNING match weight after each step and the final posterior
    repeated on every row. All contributions and running sums are
    Python-computed CASE literals assembled into one array-of-structs
    posexplode — a single codegen projection over the gamma table, no
    window, no join, no shuffle beyond the explode (rows out = (1 +
    n_fields) × pairs, bounded and predictable at any corpus size)."""
    prior_w = math.log2(prior / (1.0 - prior))

    def contrib(f: FieldComparison) -> Column:
        mv, uv = params[f.name]
        lvl_w = [
            math.log2((mv[i] + _EPS) / (uv[i] + _EPS)) for i in range(f.levels)
        ]
        expr: Column = F.lit(lvl_w[0])
        for i in range(1, f.levels):
            expr = F.when(
                F.col(f"gamma_{f.name}") == i, F.lit(lvl_w[i])
            ).otherwise(expr)
        # missing level (-1, null_aware): uninformative — weight 0
        return F.when(
            F.col(f"gamma_{f.name}") == -1, F.lit(0.0)
        ).otherwise(expr)

    steps = [
        F.struct(
            F.lit(0).alias("step"),
            F.lit("prior").alias("term"),
            F.lit(None).cast("int").alias("gamma_level"),
            F.lit(prior_w).alias("contribution"),
        )
    ]
    running: Column = F.lit(prior_w)
    runnings: list[Column] = [running]
    for j, f in enumerate(fields):
        c = contrib(f)
        running = running + c
        runnings.append(running)
        steps.append(
            F.struct(
                F.lit(j + 1).alias("step"),
                F.lit(f.name).alias("term"),
                F.col(f"gamma_{f.name}").cast("int").alias("gamma_level"),
                c.alias("contribution"),
            )
        )
    total = runnings[-1]
    odds = F.pow(F.lit(2.0), total)
    run_arr = F.array(*runnings)
    exploded = gammas.select(
        "left_id",
        "right_id",
        F.explode(F.array(*steps)).alias("s"),
        run_arr.alias("__run"),
        (odds / (odds + F.lit(1.0))).alias("posterior"),
    )
    return exploded.select(
        "left_id",
        "right_id",
        F.col("s.step").alias("step"),
        F.col("s.term").alias("term"),
        F.col("s.gamma_level").alias("gamma_level"),
        F.col("s.contribution").alias("contribution"),
        F.element_at("__run", F.col("s.step") + 1).alias("running_weight"),
        "posterior",
    )


def estimate_u_random(
    a: DataFrame,
    b: DataFrame,
    fields: list[FieldComparison],
    target_pairs: int = 1_000_000,
    seed: int = 17,
    alpha: float = 0.5,
    left_id: str = "left_id",
    right_id: str = "right_id",
    sample_rate: float | None = None,
) -> DataFrame:
    """u-probability estimation from RANDOM pairs — Splink's
    estimate_u_using_random_sampling step. At corpus scale a uniformly
    random A×B pair is a non-match with probability ~1, so the gamma-level
    marginals over a random pair sample estimate u = P(gamma | non-match)
    directly: no labels, no EM, and it covers rare agreement levels that
    blocked-pair EM starves on (blocked pairs are similarity-biased —
    exactly the wrong sample for u).

    Sampling is DETERMINISTIC (md5-dyadic per id, same device as the
    blocking-recall audit): each side keeps rows with u01(id) < rate,
    rate = min(1, sqrt(target_pairs / (|A|·|B|))), so the sample cross
    join holds ~target_pairs rows however large the corpus — the n² stays
    confined to a ~√target × √target sample while both side scans remain
    full-corpus-parallel. The two count() jobs are estimation-time only.
    Laplace-smoothed: u = (cnt + alpha) / (total + alpha·levels), so
    never-observed levels get a proper small mass instead of 0 (log2
    weights stay finite). Output: (field, gamma_level, u_prob), every
    (field, level) present."""
    spark = a.sparkSession
    if sample_rate is None:
        na = a.count()
        nb = b.count()
        sample_rate = min(1.0, (target_pairs / (na * nb)) ** 0.5)

    def samp(df: DataFrame, tag: str, id_col: str) -> DataFrame:
        u01 = (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.lit(seed), F.lit(tag), F.col(id_col))),
                    1, 6,
                ),
                16, 10,
            ).cast("bigint")
            / F.lit(float(1 << 24))
        )
        return df.where(u01 < F.lit(sample_rate))

    la = samp(a, "a", left_id).select(
        *[F.col(f.name).alias(f"__l_{f.name}") for f in fields]
    )
    rb = samp(b, "b", right_id).select(
        *[F.col(f.name).alias(f"__r_{f.name}") for f in fields]
    )
    pairs = la.crossJoin(rb)
    gam = pairs.select(
        *[
            f.gamma(F.col(f"__l_{f.name}"), F.col(f"__r_{f.name}"))
            .cast("int")
            .alias(f.name)
            for f in fields
        ]
    )
    longf = gam.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f.name).alias("field"),
                        F.col(f.name).alias("gamma_level"),
                    )
                    for f in fields
                ]
            )
        ).alias("x")
    ).select("x.*")
    # missing level (-1, null_aware) is excluded: marginals condition on
    # the field being OBSERVED on both sides, so totals are per-field
    cnt = (
        longf.where(F.col("gamma_level") >= 0)
        .groupBy("field", "gamma_level")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    grid = spark.createDataFrame(
        [(f.name, lvl, f.levels) for f in fields for lvl in range(f.levels)],
        "field string, gamma_level int, levels int",
    )
    tot = cnt.groupBy("field").agg(F.sum("cnt").alias("tot"))
    return (
        grid.join(cnt, ["field", "gamma_level"], "left")
        .join(F.broadcast(tot), "field", "left")
        .select(
            "field",
            "gamma_level",
            (
                (F.coalesce("cnt", F.lit(0)) + F.lit(alpha))
                / (F.coalesce("tot", F.lit(0)) + F.lit(alpha) * F.col("levels"))
            ).alias("u_prob"),
        )
    )


def estimate_m_from_labels(
    gammas: DataFrame,
    fields: list[FieldComparison],
    label_col: str = "label",
    alpha: float = 0.5,
) -> DataFrame:
    """m-probability estimation from labeled matches — the supervised twin
    of estimate_u_random (Splink's estimate_m_from_pairwise_labels): m =
    P(gamma level | match) is just the gamma-level marginal over pairs
    labeled 1 (clerical decisions, golden records, or planted fixtures).
    Same Laplace smoothing and full (field, level) grid contract as the u
    estimator, so the two outputs join directly into fs_score's params.
    One data-sized filter + one tiny groupBy; estimation state is
    O(Σ levels)."""
    spark = gammas.sparkSession
    pos = gammas.where(F.col(label_col).cast("int") == 1)
    longf = pos.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f.name).alias("field"),
                        F.col(f"gamma_{f.name}").alias("gamma_level"),
                    )
                    for f in fields
                ]
            )
        ).alias("x")
    ).select("x.*")
    # missing level (-1, null_aware) excluded; per-field observed totals
    cnt = (
        longf.where(F.col("gamma_level") >= 0)
        .groupBy("field", "gamma_level")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    grid = spark.createDataFrame(
        [(f.name, lvl, f.levels) for f in fields for lvl in range(f.levels)],
        "field string, gamma_level int, levels int",
    )
    tot = cnt.groupBy("field").agg(F.sum("cnt").alias("tot"))
    return (
        grid.join(cnt, ["field", "gamma_level"], "left")
        .join(F.broadcast(tot), "field", "left")
        .select(
            "field",
            "gamma_level",
            (
                (F.coalesce("cnt", F.lit(0)) + F.lit(alpha))
                / (F.coalesce("tot", F.lit(0)) + F.lit(alpha) * F.col("levels"))
            ).alias("m_prob"),
        )
    )


def params_from_estimates(
    m_df: DataFrame,
    u_df: DataFrame,
    fields: list[FieldComparison],
) -> dict[str, tuple[list[float], list[float]]]:
    """Assemble fs_score's params dict from the two estimator outputs —
    estimate_m_from_labels (supervised m) + estimate_u_random (sampled u),
    the standard Splink estimation split. Both inputs are O(Σ levels)
    rows, so the collect is estimation-state-sized, never data-sized."""
    mm = {
        (r["field"], r["gamma_level"]): r["m_prob"] for r in m_df.collect()
    }
    uu = {
        (r["field"], r["gamma_level"]): r["u_prob"] for r in u_df.collect()
    }
    out: dict[str, tuple[list[float], list[float]]] = {}
    for f in fields:
        out[f.name] = (
            [mm[(f.name, lvl)] for lvl in range(f.levels)],
            [uu[(f.name, lvl)] for lvl in range(f.levels)],
        )
    return out
