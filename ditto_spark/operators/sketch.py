"""Mergeable distinct-count sketches (HyperLogLog) for corpus statistics.

A 100 TB training-data pipeline needs per-partition-mergeable cardinality
estimates (distinct documents per source, distinct users per day, dedup-rate
monitoring in streaming sinks) where exact `count(distinct)` would shuffle
every key. Spark ships `approx_count_distinct` (also HLL), but its register
layout is JVM-internal: the sketch cannot be persisted to a stage table,
merged across engines, or oracle-checked. This module implements an
engine-portable HLL whose registers derive from md5 arithmetic available in
any SQL engine — the DuckDB oracle reproduces the registers AND the estimate
bit-for-bit (`hll_distinct` in `__spark_entry__.py`).

Design (classic Flajolet et al. 2007 HLL, m = 2^p registers):
  h    = first 32 bits of md5(value)           (engine-portable hex parse)
  idx  = top p bits of h                        (register index)
  w    = low (32-p) bits                        rho = leading zeros in w + 1
rho is computed EXACTLY via the binary-string length (`length(bin(w))`),
never floating log2 (which misrounds at powers of two). The register table
(group_cols, idx, rho=max) is the mergeable state: union + max re-derives
the whole-corpus sketch from per-partition/per-batch sketches — the property
`test_sketch.py::test_hll_merge_halves_equals_whole` pins.

The estimator keeps the harmonic sum in INTEGER arithmetic so it is
order-of-addition-free and thus deterministic across engines/partitionings:
sum(2^-rho) over registers is carried as sum(2^(maxrho - rho)), a bigint
(each term <= 2^maxrho, <= m terms — no overflow), divided back once at the
end. Empty registers contribute 2^0 each via the zero-register count V.
Linear counting (m * ln(m/V)) takes over below the 2.5m threshold, per the
paper. All custom logic is Catalyst expressions — zero shuffles beyond the
two aggregations (value -> register, register -> group), both with map-side
partial aggregation.

At scale: the shuffle carries at most m rows per group (p=9 -> 512) however
many input rows exist; the register table is the natural streaming-state /
stage-table representation (`checkpoint.StageStore` persists it like any
stage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

DEFAULT_P = 9  # 512 registers -> ~4.6% relative standard error
_HASH_BITS = 32


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = DEFAULT_P,
) -> DataFrame:
    """Sketch state: one row per (group, register index) with the max rho.

    `value_col` may be any string expression; null values are ignored (SQL
    `count(distinct)` semantics). Output: group_cols + (idx int, rho int).
    """
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4,16], got {p}")
    group_cols = list(group_cols or [])
    wbits = _HASH_BITS - p
    h = F.conv(F.substring(F.md5(F.col(value_col)), 1, 8), 16, 10).cast("bigint")
    idx = (h / F.lit(1 << wbits)).cast("bigint").cast("int").alias("idx")
    w = h % F.lit(1 << wbits)
    # rho = leading zeros of the (32-p)-bit w, plus 1. length(bin(w)) is the
    # exact bit length of w (no leading zeros, both engines); w = 0 -> all
    # wbits are zeros -> rho = wbits + 1.
    rho = (
        F.when(w == 0, F.lit(wbits + 1))
        .otherwise(F.lit(wbits + 1) - F.length(F.bin(w)))
        .cast("int")
        .alias("rho")
    )
    rows = df.where(F.col(value_col).isNotNull()).select(*group_cols, idx, rho)
    return rows.groupBy(*group_cols, "idx").agg(F.max("rho").alias("rho"))


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge sketches: union register tables, keep max rho per register.
    Commutative/associative/idempotent — safe under at-least-once replay."""
    if not register_tables:
        raise ValueError("need at least one register table")
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    keys = [c for c in out.columns if c != "rho"]
    return out.groupBy(*keys).agg(F.max("rho").alias("rho"))


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str] | None = None,
    p: int = DEFAULT_P,
) -> DataFrame:
    """Cardinality estimate per group from a register table.

    Output: group_cols + (n_registers int, sum_scaled bigint, est_distinct
    double rounded to 4 dp). sum_scaled = sum(2^(wbits+1 - rho)) over the
    observed registers — an exact integer invariant of the sketch (the
    oracle checks it bit-for-bit; the rounded double estimate rides on top).
    """
    group_cols = list(group_cols or [])
    m = 1 << p
    wbits = _HASH_BITS - p
    maxrho = wbits + 1
    alpha = _alpha(m)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("int").alias("n_registers"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {maxrho} - rho)"))
        .cast("bigint")
        .alias("sum_scaled"),
    )
    # total harmonic sum * 2^maxrho = sum_scaled + V * 2^maxrho  (V empty
    # registers each contribute 2^-0 = 1). One double division at the end.
    v = F.lit(m) - F.col("n_registers")
    denom = (F.col("sum_scaled") + v.cast("bigint") * F.lit(1 << maxrho)).cast("double")
    e_raw = F.lit(alpha * m * m * float(1 << maxrho)) / denom
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        *group_cols,
        "n_registers",
        "sum_scaled",
        F.round(est, 4).alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = DEFAULT_P,
) -> DataFrame:
    """Convenience: registers -> estimate in one call."""
    return hll_estimate(hll_registers(df, value_col, group_cols, p), group_cols, p)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): mergeable frequency
# estimates with a one-sided error (est >= true count, always). The linkage
# use case is hot-KEY detection: LSH band buckets, blocking keys, and join
# keys whose frequency crosses a salting threshold must be found BEFORE the
# pair-generating shuffle, on state small enough to broadcast — exactly what
# the count-window salting in `blocking.candidates_from_bands` needs as its
# streaming-state counterpart, and what stop-shingle pruning
# (`blocking.py` prefix filter) needs to pick its stop list without an exact
# full-vocabulary count. Spark has no built-in CMS at the DataFrame level
# (only the RDD-era countMinSketch in stat functions, whose layout is
# JVM-internal); like the HLL above, these registers are plain md5
# arithmetic, so they persist to stage tables, merge across engines and
# micro-batches, and the DuckDB oracle reproduces counters AND estimates
# bit-for-bit (`cms_hot_bigrams` in `__spark_entry__.py`).
#
# Layout: d independent rows x w buckets. Row j hashes value v to
#   bucket_j(v) = (first 32 bits of md5(j || ':' || v)) mod w
# State is (group_cols, j, bucket, cnt) — at most d*w rows per group after
# the one map-side-combinable groupBy, however many input rows exist.
# Merge = union + sum (commutative/associative; at-least-once replay safe
# only if inputs are deduplicated, unlike HLL max — documented here because
# it is the one semantic difference between the two sketch states).
# ---------------------------------------------------------------------------

DEFAULT_CMS_D = 4  # depth: P(overestimate by > eps*N) <= exp(-d)
DEFAULT_CMS_W = 1024  # width: eps = e/w additive error per row


def _cms_bucket(j_col: Column, value_col: Column, w: int) -> Column:
    """Portable bucket: first 32 md5 bits of 'j:value', mod w. The j prefix
    makes the d rows pairwise-independent hash functions from one md5."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(j_col.cast("string"), F.lit(":"), value_col)), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return (h % F.lit(w)).cast("int")


def cms_counters(
    df: DataFrame,
    value_col: str,
    d: int = DEFAULT_CMS_D,
    w: int = DEFAULT_CMS_W,
    group_cols: list[str] | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """CMS state: one row per (group, j, bucket) with the summed count.

    Null values are ignored. ``weight_col`` (optional, long) counts each
    input row with a weight instead of 1 — e.g. pre-aggregated (key, cnt)
    inputs. Output: group_cols + (j int, bucket int, cnt long).
    """
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 and w >= 2, got d={d} w={w}")
    group_cols = list(group_cols or [])
    wt = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = (
        df.where(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            F.col(value_col).alias("__v"),
            wt.alias("__wt"),
            F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j"),
        )
        .select(
            *group_cols,
            "j",
            _cms_bucket(F.col("j"), F.col("__v"), w).alias("bucket"),
            "__wt",
        )
    )
    return rows.groupBy(*group_cols, "j", "bucket").agg(
        F.sum("__wt").alias("cnt")
    )


def cms_merge(*counter_tables: DataFrame) -> DataFrame:
    """Merge sketches: union counter tables, sum per (group, j, bucket).
    Counts are additive, so merging the same batch twice double-counts —
    feed exactly-once (or deduplicated) batches, unlike hll_merge."""
    if not counter_tables:
        raise ValueError("need at least one counter table")
    out = counter_tables[0]
    for t in counter_tables[1:]:
        out = out.unionByName(t)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    probe_col: str,
    d: int = DEFAULT_CMS_D,
    w: int = DEFAULT_CMS_W,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Point estimates for a probe set: min over the d rows of the probed
    buckets. Guaranteed est >= true count (CMS never undercounts).

    ``probes`` carries one row per (group, probe value); in production the
    probe set is the keys of the current micro-batch or the candidate
    blocking keys under salting review — small, so the join broadcasts the
    probes, never the counters. Missing buckets count 0 via the left join.
    Output: group_cols + (probe_col, est long).
    """
    group_cols = list(group_cols or [])
    probed = probes.select(
        *group_cols,
        F.col(probe_col),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j"),
    ).withColumn("bucket", _cms_bucket(F.col("j"), F.col(probe_col), w))
    joined = probed.join(counters, [*group_cols, "j", "bucket"], "left")
    return joined.groupBy(*group_cols, probe_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0)).cast("long")).alias("est")
    )


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold: int,
    d: int = DEFAULT_CMS_D,
    w: int = DEFAULT_CMS_W,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Keys whose CMS estimate reaches ``threshold`` (one-sided: every true
    heavy hitter is returned; collisions may add false positives, bounded
    by the d x w sizing). This convenience probes the input's own distinct
    keys — the batch-analysis form; the streaming form keeps `cms_counters`
    as state and probes each arriving batch's keys via `cms_estimate`."""
    counters = cms_counters(df, value_col, d, w, group_cols)
    probes = df.where(F.col(value_col).isNotNull()).select(
        *(group_cols or []), value_col
    ).distinct()
    est = cms_estimate(counters, probes, value_col, d, w, group_cols)
    return est.where(F.col("est") >= threshold)


def salt_factors(
    est_df: DataFrame,
    max_bucket: int,
    key_col: str,
    est_col: str = "est",
) -> DataFrame:
    """Turn frequency estimates into a salting plan: keys whose estimated
    count exceeds ``max_bucket`` get n_salts = ceil(est / max_bucket) cells.
    Output (key, n_salts) is the broadcast side of a salted join — rows of a
    hot key scatter over n_salts sub-cells (and the other side replicates
    across them), bounding every cell at ~max_bucket rows. Keys at or under
    the cap are omitted: absent = unsalted, so the plan table stays as small
    as the hot-key set itself. Because CMS estimates never undercount, a
    true hot key can never be missed — only slightly over-salted."""
    if max_bucket < 1:
        raise ValueError(f"max_bucket must be >= 1, got {max_bucket}")
    n = F.ceil(F.col(est_col) / F.lit(max_bucket)).cast("int")
    return est_df.select(F.col(key_col), n.alias("n_salts")).where(
        F.col("n_salts") > 1
    )


def cms_join_size(
    counters_a: DataFrame,
    counters_b: DataFrame,
    d: int = DEFAULT_CMS_D,
) -> DataFrame:
    """Equi-join output-size estimate from two CMS counter tables (Cormode &
    Muthukrishnan 2005 §4.2, the AGMS-style inner product): |A ⋈ B| =
    Σ_k f_A(k)·f_B(k) is estimated as min over the d rows of
    Σ_bucket cntA·cntB — an upper bound (est >= true, like point queries),
    exact when no colliding key pair shares a bucket in the minimizing row.

    This is the pre-shuffle join planner: both sketches are ≤ d·w rows
    (broadcastable), so the driver can ask "how many pairs will this
    blocking join emit?" — and hence choose broadcast vs sort-merge vs a
    salting budget — WITHOUT running the join. The two counter tables must
    share (d, w). Output: one row (est_join_size long)."""
    prod = counters_a.alias("a").join(
        counters_b.alias("b"), ["j", "bucket"]
    ).select(
        F.col("j"),
        (F.col("a.cnt") * F.col("b.cnt")).alias("p"),
    )
    per_row = prod.groupBy("j").agg(F.sum("p").alias("s"))
    # a row with zero overlapping buckets has inner product 0; rows absent
    # from the join entirely mean SOME row saw no collisions -> est 0.
    n_rows = per_row.agg(
        F.count(F.lit(1)).alias("n"), F.min("s").alias("m")
    )
    return n_rows.select(
        F.when(F.col("n") < d, F.lit(0))
        .otherwise(F.col("m"))
        .cast("long")
        .alias("est_join_size")
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970): mergeable membership sketch + semi-join pruning
# ---------------------------------------------------------------------------

BLOOM_BITS_PER_WORD = 63  # bit 63 never set -> words stay positive in
#                           signed-64 engines (Spark bigint, DuckDB BIGINT)
DEFAULT_BLOOM_WORDS = 256
DEFAULT_BLOOM_K = 5


def _shl1(bitpos: Column) -> Column:
    """1L << bitpos for a COLUMN shift amount (F.shiftleft only accepts a
    Python-int literal there)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("bigint"), bitpos.cast("int")
    )


def _bloom_bit(value: Column, j: int, m_bits: int) -> Column:
    """Bit position of hash j for ``value``: the first 60 bits of
    md5(j ':' value) mod m_bits. Engine-portable — the DuckDB oracle
    computes ('0x' || substr(md5(j || ':' || v), 1, 15))::BIGINT % m_bits."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(j)), value)), 1, 15),
        16,
        10,
    ).cast("bigint")
    return h % F.lit(m_bits)


def bloom_words(
    df: DataFrame,
    value_col: str,
    m_words: int = DEFAULT_BLOOM_WORDS,
    k: int = DEFAULT_BLOOM_K,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Mergeable Bloom-filter state: one row per (group, word index) with
    the bit-or of every member value's k hash bits falling in that word.
    Nulls are ignored (membership of NULL is undefined in SQL semantics).
    Only non-zero words appear; absent word = 0.

    Like the HLL/CMS sketches above, the state is engine-portable md5
    arithmetic, so it persists to stage tables, merges across batches and
    engines (union + bit_or — `test_sketch.py` pins halves == whole), and
    the DuckDB oracle rebuilds it bit-for-bit (`bloom_filter_words`).

    Scale shape: bit positions are a zero-shuffle codegen projection
    (k rows per input row); the only shuffle is ONE map-side-combinable
    groupBy whose output is <= m_words rows per group regardless of input
    size — a 10^12-key build still ships at most m_words rows per group."""
    if m_words < 1 or k < 1:
        raise ValueError(f"need m_words >= 1 and k >= 1, got {m_words}, {k}")
    group_cols = list(group_cols or [])
    m_bits = m_words * BLOOM_BITS_PER_WORD
    v = F.col(value_col)
    bits = df.where(v.isNotNull()).select(
        *group_cols,
        F.explode(
            F.array(*[_bloom_bit(v, j, m_bits) for j in range(k)])
        ).alias("bit"),
    )
    return (
        bits.select(
            *group_cols,
            (F.col("bit") / BLOOM_BITS_PER_WORD).cast("int").alias("idx"),
            _shl1(F.col("bit") % BLOOM_BITS_PER_WORD).alias("mask"),
        )
        .groupBy(*group_cols, "idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_dense_vector(words_df: DataFrame, m_words: int) -> list[int]:
    """Collect a (single-group) word table into the dense driver-side
    vector `bloom_might_contain_expr` embeds. The collect moves at most
    m_words rows — the same legitimacy class as a broadcast-join build
    side; this is how the filter crosses from the build job to the probe
    job (or from a stage table into a later run)."""
    vec = [0] * m_words
    for r in words_df.select("idx", "word").collect():
        vec[int(r["idx"])] = int(r["word"])
    return vec


def bloom_might_contain_expr(
    value: Column,
    words: list[int],
    k: int = DEFAULT_BLOOM_K,
) -> Column:
    """Membership test as a pure Catalyst projection over the dense word
    vector (a plan literal — zero shuffle, zero Python, stays inside
    WholeStageCodegen). False positives possible (rate ~ (1-e^{-kn/m})^k),
    false negatives impossible — the property the pruning use relies on."""
    m_bits = len(words) * BLOOM_BITS_PER_WORD
    arr = F.array(*[F.lit(w).cast("bigint") for w in words])
    checks = []
    for j in range(k):
        bit = _bloom_bit(value, j, m_bits)
        word = F.element_at(arr, (bit / BLOOM_BITS_PER_WORD).cast("int") + 1)
        mask = _shl1(bit % BLOOM_BITS_PER_WORD)
        checks.append(word.bitwiseAND(mask) != 0)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_prune(
    df: DataFrame,
    value_col: str,
    words: list[int],
    k: int = DEFAULT_BLOOM_K,
) -> DataFrame:
    """Semi-join reduction (Bernstein & Chiu 1981 applied via Bloom, the
    classic distributed-query bloom-join): keep only rows whose
    ``value_col`` MIGHT be in the filter, before paying for the real
    shuffle join. Because false negatives are impossible, `prune -> exact
    join` returns exactly `exact join` — the end-to-end identity the
    `bloom_prune_semijoin` oracle checks — while the shuffle only carries
    the surviving fraction. This is the standard pattern for incremental
    linkage at 100 TB: master-side keys -> tiny word table -> prune the
    daily update feed down to the rows that can possibly link."""
    return df.where(bloom_might_contain_expr(F.col(value_col), words, k))
