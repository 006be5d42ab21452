"""Deterministic synthetic multi-turn transcript corpus with planted duplicates.

Matches the BASELINE.json input_hint shape exactly:
    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

Base conversations are generated from a seeded vocabulary; each base spawns
0..max_dups duplicate variants (new conv_id, same turn structure, paraphrase
noise). The noise model mirrors the reference's augmentation operators
(token del / swap / insert — /root/reference/ditto_light/augment.py:13-187)
used here as a corruption model rather than train-time DA.

Generation is distributed (mapInPandas over spark.range) and keyed by
(seed, base_id), so output is byte-identical regardless of partitioning or
parallelism — the determinism invariant the tests assert.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_COMMON = [
    "deploy", "cluster", "error", "retry", "timeout", "schema", "parquet",
    "shuffle", "partition", "broadcast", "join", "filter", "window", "stream",
    "batch", "token", "model", "index", "cache", "query", "table", "column",
    "metric", "latency", "throughput", "config", "driver", "executor", "stage",
    "task", "checkpoint", "lineage", "snapshot", "rollback", "commit", "merge",
    "upsert", "compact", "vacuum", "scan", "predicate", "pushdown", "prune",
    "codegen", "arrow", "pandas", "vector", "hash", "sort", "spill",
]
# Realistic corpora have thousands of distinct tokens; a 50-word vocabulary
# makes every random pair look similar (token-distribution collision), so the
# bulk of the vocabulary is synthetic rare-ish words.
_VOCAB = _COMMON + [f"w{i:04d}" for i in range(1500)]
_TOOLS = ["search", "bash", "python", "browser", "sql"]
_ROLES = ["user", "assistant"]
_EPOCH = datetime(2025, 1, 1)


def _gen_base_turns(rng: np.random.RandomState) -> list[tuple[str, str, str | None]]:
    """One conversation: list of (role, text, tool)."""
    n_turns = int(rng.randint(3, 13))
    turns = []
    for t in range(n_turns):
        role = _ROLES[t % 2]
        n_tok = int(rng.randint(6, 18))
        toks = [_VOCAB[i] for i in rng.randint(0, len(_VOCAB), size=n_tok)]
        tool = None
        if role == "assistant" and rng.rand() < 0.3:
            tool = _TOOLS[int(rng.randint(0, len(_TOOLS)))]
        turns.append((role, " ".join(toks), tool))
    return turns


def _perturb(text: str, rng: np.random.RandomState, noise: float) -> str:
    """Paraphrase noise: token del / adjacent swap / insert (augment.py model)."""
    toks = text.split()
    out: list[str] = []
    i = 0
    while i < len(toks):
        r = rng.rand()
        if r < noise * 0.5 and len(toks) > 4:  # delete
            i += 1
            continue
        if r < noise and i + 1 < len(toks):  # swap adjacent
            out.append(toks[i + 1])
            out.append(toks[i])
            i += 2
            continue
        out.append(toks[i])
        if rng.rand() < noise * 0.3:  # insert
            out.append(_VOCAB[int(rng.randint(0, len(_VOCAB)))])
        i += 1
    return " ".join(out) if out else text


def generate_transcripts(
    spark: SparkSession,
    n_base: int = 200,
    seed: int = 42,
    max_dups: int = 3,
    dup_prob: float = 0.6,
    noise: float = 0.08,
    hot_template_frac: float = 0.0,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcript generator.

    hot_template_frac > 0 makes the LAST ceil(frac*n_base) base conversations
    share one hot template text (distinct ids, near-identical text) to
    exercise skew/salting in blocking.
    """
    n_hot = int(np.ceil(hot_template_frac * n_base)) if hot_template_frac > 0 else 0
    hot_start = n_base - n_hot

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hot_rng = np.random.RandomState(seed ^ 0x5EED)
        hot_template = _gen_base_turns(hot_rng)
        for pdf in batches:
            rows: list[tuple] = []
            for base in pdf["id"].to_numpy():
                base = int(base)
                rng = np.random.RandomState((seed * 1_000_003 + base) % (2**31 - 1))
                if base >= hot_start:
                    turns = [
                        (r, _perturb(t, rng, 0.02), tool) for r, t, tool in hot_template
                    ]
                else:
                    turns = _gen_base_turns(rng)
                n_dup = 0
                if rng.rand() < dup_prob:
                    n_dup = int(rng.randint(1, max_dups + 1))
                # hot-template conversations are textually near-identical by
                # construction, so they ARE one entity: mark with 'h' so the
                # truth derivation puts the whole hot group in one cluster
                prefix = "h" if base >= hot_start else "c"
                for v in range(n_dup + 1):
                    conv_id = f"{prefix}{base:08d}_{v}"
                    t0 = _EPOCH + timedelta(minutes=base * 17 + v)
                    for ti, (role, text, tool) in enumerate(turns):
                        txt = text if v == 0 else _perturb(text, rng, noise)
                        rows.append(
                            (conv_id, ti, role, txt, tool, t0 + timedelta(seconds=30 * ti))
                        )
            yield pd.DataFrame(
                rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)
    base_df = spark.range(0, n_base, 1, parts)
    return base_df.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def golden_clusters(transcripts: DataFrame) -> DataFrame:
    """Planted truth: cluster_id = canonical (min) conv_id of the dup group.

    conv_id encodes the group: c<base>_<variant> groups by base;
    h<base>_<variant> (hot template) is ONE group regardless of base.
    """
    ids = transcripts.select("conv_id").distinct()
    keyed = ids.withColumn(
        "grp",
        F.when(F.col("conv_id").startswith("h"), F.lit("hot")).otherwise(
            F.split("conv_id", "_").getItem(0)
        ),
    )
    canon = keyed.groupBy("grp").agg(F.min("conv_id").alias("cluster_id"))
    return keyed.join(F.broadcast(canon), "grp").select("conv_id", "cluster_id")


def golden_pairs(transcripts: DataFrame, neg_per_pos: int = 3, seed: int = 42) -> DataFrame:
    """Labeled pairs (left_id < right_id, label 1/0) — positives are all
    within-group pairs, negatives sampled cross-group deterministically."""
    convs = golden_clusters(transcripts)
    pos = (
        convs.alias("a")
        .join(convs.alias("b"), F.col("a.cluster_id") == F.col("b.cluster_id"))
        .where(F.col("a.conv_id") < F.col("b.conv_id"))
        .select(
            F.col("a.conv_id").alias("left_id"),
            F.col("b.conv_id").alias("right_id"),
            F.lit(1).alias("label"),
        )
    )
    # deterministic pseudo-random negatives: join on a hash-bucket, different cluster
    c = convs.withColumn("bkt", F.pmod(F.xxhash64("conv_id", F.lit(seed)), F.lit(50)))
    neg = (
        c.alias("a")
        .join(c.alias("b"), F.col("a.bkt") == F.col("b.bkt"))
        .where(
            (F.col("a.cluster_id") != F.col("b.cluster_id"))
            & (F.col("a.conv_id") < F.col("b.conv_id"))
        )
        .select(
            F.col("a.conv_id").alias("left_id"),
            F.col("b.conv_id").alias("right_id"),
            F.lit(0).alias("label"),
        )
    )
    n_pos = pos.count()
    neg = neg.orderBy(F.xxhash64("left_id", "right_id")).limit(neg_per_pos * n_pos)
    return pos.unionByName(neg)
