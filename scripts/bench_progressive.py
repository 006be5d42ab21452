#!/usr/bin/env python
"""Wall-clock evidence for progressive (pay-as-you-go) scoring.

Runs the default flagship (`dedup_transcripts`) and the progressive variant
(`dedup_transcripts_progressive`) on the SAME deterministic synthetic corpus
in one JVM, interleaved (default, progressive, default, progressive) so a VM
stall cannot poison one side, and asserts the cluster outputs are identical
(same partition of conv_ids — compared by canonical-min-member cluster key,
not by cluster_id value, which is representative-dependent).

The progressive path's claim (commit ffaa19e) was "54% fewer scorer calls,
identical clusters" — this script adds the missing wall-clock number: what
those saved Arrow-UDF invocations buy at a given input scale, net of the
n_batches meta-CC rounds + id joins the variant spends to get them.

Env:
  SPARK_GRAFT_CPUS        cores (default 32)
  SPARK_GRAFT_BENCH_NBASE base conversations (default 200000 = the 10x point)
  SPARK_GRAFT_PROG_REPEAT timed runs per variant (default 2)
  SPARK_GRAFT_PROG_BATCHES progressive n_batches (default 4)

Writes BENCH/progressive_<cores>_<nbase>.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _loadavg() -> float:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:
        return -1.0


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_base = int(os.environ.get("SPARK_GRAFT_BENCH_NBASE", "200000"))
    repeat = int(os.environ.get("SPARK_GRAFT_PROG_REPEAT", "2"))
    n_batches = int(os.environ.get("SPARK_GRAFT_PROG_BATCHES", "4"))

    from ditto_spark.session import get_spark
    from ditto_spark.synth import generate_transcripts
    from ditto_spark.pipeline import (
        PipelineConfig,
        dedup_transcripts,
        dedup_transcripts_progressive,
    )
    import pyspark.sql.functions as F

    spark = get_spark(app_name="bench-progressive", cores=cores)
    transcripts = generate_transcripts(
        spark, n_base=n_base, seed=42, hot_template_frac=0.02
    ).cache()
    n_turns = transcripts.count()

    def canonical_checksum(clusters) -> tuple[int, int, int]:
        """(n_rows, n_clusters, checksum) under representative-free keys:
        each cluster keyed by its min conv_id member."""
        canon = (
            clusters.groupBy("cluster_id")
            .agg(F.min("conv_id").alias("ckey"))
            .join(clusters, "cluster_id")
            .select(
                F.xxhash64(F.col("ckey"), F.col("conv_id")).alias("h"),
                "conv_id",
            )
        )
        row = canon.agg(
            F.count("*").alias("n"),
            F.count_distinct("h").alias("nh"),
            F.expr("bit_xor(h)").alias("s"),
        ).collect()[0]
        n_clusters = clusters.select("cluster_id").distinct().count()
        return int(row["n"]), n_clusters, int(row["s"])

    def run_default() -> tuple[float, tuple]:
        spark.catalog.clearCache()
        transcripts.cache()
        transcripts.count()
        t0 = time.monotonic()
        res = dedup_transcripts(transcripts, PipelineConfig())
        sig = canonical_checksum(res.clusters)
        return round(time.monotonic() - t0, 3), sig

    last_stats: dict = {}

    def run_progressive() -> tuple[float, tuple]:
        nonlocal last_stats
        spark.catalog.clearCache()
        transcripts.cache()
        transcripts.count()
        t0 = time.monotonic()
        clusters, stats = dedup_transcripts_progressive(
            transcripts, PipelineConfig(), n_batches=n_batches
        )
        sig = canonical_checksum(clusters)
        last_stats = stats
        return round(time.monotonic() - t0, 3), sig

    # one untimed warm-up (lazy heap commit — see bench.py round-3 note)
    t0 = time.monotonic()
    warm_sig = run_default()[1]
    warmup_sec = round(time.monotonic() - t0, 3)

    runs: dict[str, list[float]] = {"default": [], "progressive": []}
    loads: list[float] = []
    sigs: set[tuple] = {warm_sig}
    for _ in range(repeat):
        for name, fn in (("default", run_default), ("progressive", run_progressive)):
            loads.append(_loadavg())
            sec, sig = fn()
            runs[name].append(sec)
            sigs.add(sig)

    identical = len(sigs) == 1
    t_def = min(runs["default"])
    t_prog = min(runs["progressive"])
    out = {
        "metric": "progressive_vs_default_flagship_sec",
        "unit": "sec",
        "cores": cores,
        "n_base_conversations": n_base,
        "n_turns": n_turns,
        "n_batches": n_batches,
        "default_sec_min": t_def,
        "progressive_sec_min": t_prog,
        "speedup": round(t_def / t_prog, 3) if t_prog else None,
        "runs": runs,
        "clusters_identical": identical,
        "cluster_signature": list(sigs)[0] if identical else sorted(sigs),
        "progressive_stats": last_stats,
        "loadavg_per_run": loads,
        "warmup_run_sec": warmup_sec,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", f"progressive_{cores}_{n_base}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    if not identical:
        sys.exit(1)


if __name__ == "__main__":
    main()
