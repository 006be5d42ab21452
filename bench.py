#!/usr/bin/env python
"""Benchmark harness — times the headline pipelines at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and
prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys (pairs/sec throughput, core count) ride along for the scaling
analysis in BENCH/BASELINE.md: running this script at two parallelism levels
(SPARK_GRAFT_CPUS=8 vs 32) on identical input evidences the north rule's
N→4N scaling-efficiency criterion in a single-box sandbox.

Each timed query is forced end-to-end with a noop-format write (materializes
every column — unlike count(), nothing is pruned).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> int:
    """Fully materialize a DataFrame; return row count."""
    df = df.cache()
    n = df.count()
    df.unpersist()
    return n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        sf = 0.1

    from ditto_spark.session import get_spark
    from ditto_spark.synth import generate_transcripts
    from ditto_spark.pipeline import dedup_transcripts, PipelineConfig
    import __spark_entry__ as E

    spark = get_spark("ditto_spark_bench", cores=cores)
    # Warm-up: a miniature end-to-end pipeline compiles the (large) codegen
    # for the 64-permutation MinHash projection, spawns the Python UDF
    # workers, and JITs the hot paths — so the timed region measures
    # steady-state throughput, not one-time driver costs.
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    _warm = dedup_transcripts(
        generate_transcripts(spark, n_base=60, seed=7), PipelineConfig()
    )
    _warm.clusters.count()

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name: str, df) -> None:
        t0 = time.monotonic()
        counts[name] = _force(df)
        timings[name] = round(time.monotonic() - t0, 3)

    # --- flagship: full transcript linkage (serialize → LSH → Arrow-UDF
    # scorer → threshold → connected components) on the deterministic
    # synthetic corpus, sized by sf (sf0.1 → 20k base conversations,
    # ~57k entities after planted duplicates, ~500k turns).
    n_base = int(os.environ.get("SPARK_GRAFT_BENCH_NBASE", "0")) or max(
        int(200_000 * sf), 200
    )
    transcripts = generate_transcripts(
        spark, n_base=n_base, seed=42, hot_template_frac=0.02
    ).cache()
    n_turns = transcripts.count()  # materialize synth outside the timed region

    # full pipeline timed FIRST (blocking timed after, on a fresh plan, so
    # no lingering cache blocks can be attributed to the wrong query).
    # dedup_transcripts is timed as a whole: the connected-components loop
    # executes eagerly (per-round localCheckpoint) during construction.
    t0 = time.monotonic()
    res = dedup_transcripts(transcripts, PipelineConfig())
    counts["transcript_full_dedup"] = _force(res.clusters)
    timings["transcript_full_dedup"] = round(time.monotonic() - t0, 3)

    res2 = dedup_transcripts(transcripts, PipelineConfig())
    t0 = time.monotonic()
    n_cand = _force(res2.candidates.select("left_id", "right_id", "est_jaccard"))
    timings["transcript_blocking"] = round(time.monotonic() - t0, 3)
    counts["transcript_blocking"] = n_cand

    # --- document near-dup pipeline + LSH candidates on driver testdata
    timed("doc_dedup_clusters", E.q_doc_dedup_clusters(spark, sf_dir))
    timed("minhash_lsh_candidates", E.q_minhash_lsh_candidates(spark, sf_dir))
    timed("serialize_events", E.q_serialize_events(spark, sf_dir))
    timed("embedding_cosine_topk", E.q_embedding_cosine_topk(spark, sf_dir))
    timed("ngram_jaccard_pairs", E.q_ngram_jaccard_pairs(spark, sf_dir))

    transcripts.unpersist()
    total = round(sum(timings.values()), 3)
    # headline throughput: candidate pairs pushed through the full
    # serialize→block→score→cluster job
    full_t = timings["transcript_full_dedup"]
    pairs_per_sec = round(n_cand / full_t, 1) if full_t > 0 else 0.0

    print(
        json.dumps(
            {
                "metric": "total_bench_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cores": cores,
                "rows": counts,
                "n_turns": n_turns,
                "n_base_conversations": n_base,
                "candidate_pairs": n_cand,
                "candidate_pairs_per_sec": pairs_per_sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
