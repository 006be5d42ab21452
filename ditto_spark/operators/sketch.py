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

from pyspark.sql import DataFrame
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
