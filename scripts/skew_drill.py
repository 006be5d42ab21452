#!/usr/bin/env python
"""Skew drill (round-3 verdict task 5): stress-measure the salted-banding
story instead of only plan-asserting it.

Three measurements, one JSON line each into BENCH/skew_drill.json:

1. **Bucket histogram before/after salting** on a skewed corpus
   (hot_template_frac=0.3 — one template dominates ~30% of base
   conversations): band-bucket size distribution of the raw MinHash bands
   vs the post-salt cell sizes. Evidence the pair-generating join never
   sees a bucket above max_bucket.
2. **Blocking-stage A/B, salted vs unsalted**, at a size where unsalted is
   still runnable (n_base=2000): wall + candidate count. Evidence salting
   bounds the pair-generating shuffle itself, not just downstream work.
3. **Flagship wall, uniform vs skewed corpus at equal size** (bench-scale
   n_base=20000, hot 0.02 vs 0.30): wall, candidate pairs, and pairs/sec.
   The skewed corpus genuinely CONTAINS a giant duplicate group, so its
   pair volume (the real work) is larger; the bounded-skew claim is that
   THROUGHPUT (pairs/sec) stays within ~1.5x of uniform — no quadratic
   bucket blowup, no straggler collapse. The progressive-scoring variant
   rides along: near-clique groups resolve from their first accepted
   edges, so most hot-group pairs never reach the scorer.

Run: python scripts/skew_drill.py  (env: SPARK_GRAFT_CPUS, default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from ditto_spark.session import get_spark  # noqa: E402
from ditto_spark.synth import generate_transcripts  # noqa: E402
from ditto_spark.pipeline import (  # noqa: E402
    PipelineConfig,
    dedup_transcripts,
    dedup_transcripts_progressive,
)
from ditto_spark.operators.serialize import serialize_conversations  # noqa: E402
from ditto_spark.operators.blocking import (  # noqa: E402
    block_minhash_lsh,
    lsh_bands,
    minhash_signatures,
    salt_cell_assignment,
    shingle,
    tokenize,
)


def bucket_histogram(spark, transcripts, cfg: PipelineConfig) -> dict:
    """Band-bucket sizes pre-salt and post-salt cell sizes."""
    ser = serialize_conversations(transcripts).persist()
    ser.count()
    shingled = shingle(tokenize(ser, "block_text"), cfg.shingle_n)
    sig = minhash_signatures(shingled, num_perm=cfg.num_perm)
    bands = lsh_bands(
        sig, num_bands=cfg.num_bands, rows_per_band=cfg.rows_per_band
    )
    sizes = (
        bands.groupBy("band_idx", "band_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist()
    )
    pre = {
        "max_bucket": sizes.agg(F.max("n")).first()[0],
        "buckets_gt_max": sizes.where(F.col("n") > cfg.max_bucket).count(),
        "histogram": {
            str(r["bin"]): r["cnt"]
            for r in sizes.select(
                F.pow(F.lit(2), F.ceil(F.log2("n"))).cast("long").alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        },
        # unsalted worst-case pair work: sum n*(n-1)/2 over buckets
        "unsalted_pair_work": sizes.agg(
            F.sum(F.shiftright(F.col("n") * (F.col("n") - 1), 1))
        ).first()[0],
    }
    # post-salt: THE production cell assignment (blocking.salt_cell_
    # assignment — shared code, not a re-implementation, so the drill can
    # never measure a split the pipeline no longer performs), including
    # the production bucket_n > 1 pre-filter (singleton buckets never
    # enter the pair join)
    salted = (
        salt_cell_assignment(
            bands.join(sizes, ["band_idx", "band_key"]).where(F.col("n") > 1),
            max_bucket=cfg.max_bucket,
            bucket_n_col="n",
        )
        .groupBy("band_idx", "band_key", "salt")
        .agg(F.count(F.lit(1)).alias("cn"))
        .persist()
    )
    post = {
        "max_cell": salted.agg(F.max("cn")).first()[0],
        "salted_pair_work": salted.agg(
            F.sum(F.shiftright(F.col("cn") * (F.col("cn") - 1), 1))
        ).first()[0],
    }
    salted.unpersist()
    sizes.unpersist()
    ser.unpersist()
    return {"pre_salt": pre, "post_salt": post}


def timed_blocking(spark, transcripts, cfg: PipelineConfig, max_bucket: int):
    ser = serialize_conversations(transcripts).persist()
    ser.count()
    t0 = time.monotonic()
    cand = block_minhash_lsh(
        ser,
        text_col="block_text",
        shingle_n=cfg.shingle_n,
        num_perm=cfg.num_perm,
        num_bands=cfg.num_bands,
        rows_per_band=cfg.rows_per_band,
        max_bucket=max_bucket,
        threshold=cfg.lsh_prefilter,
    )
    n = cand.count()
    wall = round(time.monotonic() - t0, 3)
    ser.unpersist()
    return wall, n


def timed_flagship(spark, transcripts, cfg: PipelineConfig):
    spark.catalog.clearCache()
    transcripts.cache()
    transcripts.count()
    t0 = time.monotonic()
    res = dedup_transcripts(transcripts, cfg)
    n_clusters = res.clusters.cache().count()
    wall = round(time.monotonic() - t0, 3)
    n_cand = res.candidates.count()
    res.clusters.unpersist()
    return wall, n_cand, n_clusters


def timed_progressive(spark, transcripts, cfg: PipelineConfig):
    spark.catalog.clearCache()
    transcripts.cache()
    transcripts.count()
    t0 = time.monotonic()
    clusters, stats = dedup_transcripts_progressive(transcripts, cfg)
    n_clusters = clusters.count()
    wall = round(time.monotonic() - t0, 3)
    return wall, n_clusters, stats


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_base = int(os.environ.get("SPARK_GRAFT_SKEW_NBASE", "20000"))
    spark = get_spark("skew_drill", cores=cores)
    cfg = PipelineConfig()
    out: dict = {"cores": cores, "n_base": n_base}

    # warm-up (heap commit + JIT, same discipline as bench.py)
    warm = dedup_transcripts(generate_transcripts(spark, n_base=60, seed=7), cfg)
    warm.clusters.count()
    spark.catalog.clearCache()

    # 1. bucket histogram on the skewed corpus
    skewed_small = generate_transcripts(
        spark, n_base=2000, seed=42, hot_template_frac=0.3
    ).cache()
    skewed_small.count()
    out["bucket_histogram_skewed_2k"] = bucket_histogram(spark, skewed_small, cfg)

    # 2. blocking A/B salted vs unsalted at n_base=2000
    w_salted, n_salted = timed_blocking(spark, skewed_small, cfg, cfg.max_bucket)
    w_unsalted, n_unsalted = timed_blocking(
        spark, skewed_small, cfg, 10_000_000
    )
    out["blocking_ab_2k"] = {
        "salted_wall_sec": w_salted,
        "salted_candidates": n_salted,
        "unsalted_wall_sec": w_unsalted,
        "unsalted_candidates": n_unsalted,
    }
    skewed_small.unpersist()

    # 3. flagship uniform vs skewed at bench scale
    uniform = generate_transcripts(
        spark, n_base=n_base, seed=42, hot_template_frac=0.02
    ).cache()
    w_u, cand_u, cl_u = timed_flagship(spark, uniform, cfg)
    # second pass to shed residual warmup; keep the min
    w_u2, _, _ = timed_flagship(spark, uniform, cfg)
    w_u = min(w_u, w_u2)
    uniform.unpersist()

    skewed = generate_transcripts(
        spark, n_base=n_base, seed=42, hot_template_frac=0.3
    ).cache()
    w_s, cand_s, cl_s = timed_flagship(spark, skewed, cfg)
    w_s2, _, _ = timed_flagship(spark, skewed, cfg)
    w_s = min(w_s, w_s2)
    w_p, cl_p, pstats = timed_progressive(spark, skewed, cfg)
    skewed.unpersist()

    tp_u = round(cand_u / w_u, 1)
    tp_s = round(cand_s / w_s, 1)
    out["flagship_equal_size"] = {
        "uniform": {
            "wall_sec": w_u, "candidates": cand_u,
            "clusters": cl_u, "pairs_per_sec": tp_u,
        },
        "skewed_hot30": {
            "wall_sec": w_s, "candidates": cand_s,
            "clusters": cl_s, "pairs_per_sec": tp_s,
        },
        "wall_ratio_skewed_over_uniform": round(w_s / w_u, 2),
        "throughput_ratio_uniform_over_skewed": round(tp_u / tp_s, 2),
        "progressive_on_skewed": {
            "wall_sec": w_p, "clusters": cl_p, "stats": pstats,
        },
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/skew_drill.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
