#!/usr/bin/env python
"""spark-submit entry point for the transcript-linkage pipeline
(north_rule: `spark-submit --py-files` execution on a multi-executor
cluster).

Cluster usage:

    cd /root/repo && zip -r /tmp/ditto_spark.zip ditto_spark
    spark-submit \
      --py-files /tmp/ditto_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.adaptive.skewJoin.enabled=true \
      --conf spark.sql.shuffle.partitions=<2-3x total cores> \
      scripts/run_pipeline.py \
      --input  <transcripts parquet/Iceberg path> \
      --output <checkpoint root> \
      --run-id run1 --tau 0.5

Local smoke (no cluster):

    python scripts/run_pipeline.py --synthetic 2000 --output /tmp/ckpt

The job is resumable: re-running with the same --output/--run-id skips
every stage whose committed output exists (see ditto_spark.checkpoint).
Stage lineage + per-partition metrics land in <output>/<run-id>/_lineage.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="transcript record-linkage pipeline")
    ap.add_argument("--input", help="transcripts table path (parquet)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate a deterministic synthetic corpus of N base "
                         "conversations instead of reading --input")
    ap.add_argument("--output", required=True, help="checkpoint root directory")
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--tau", type=float, default=0.5, help="match threshold")
    ap.add_argument("--shingle-n", type=int, default=2)
    ap.add_argument("--num-perm", type=int, default=64)
    ap.add_argument("--num-bands", type=int, default=21)
    ap.add_argument("--rows-per-band", type=int, default=3)
    ap.add_argument("--max-bucket", type=int, default=200)
    ap.add_argument("--lsh-prefilter", type=float, default=0.15)
    ap.add_argument("--jvm-scorer", action="store_true",
                    help="use the pure-JVM Jaccard scorer instead of the Arrow UDF")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # under spark-submit the session/config comes from the launcher; the
    # local fallback builds one with the repo defaults
    spark = SparkSession.getActiveSession()
    if spark is None:
        from ditto_spark.session import get_spark

        spark = get_spark("ditto_spark_pipeline")

    from ditto_spark.checkpoint import StageStore, dedup_transcripts_checkpointed
    from ditto_spark.pipeline import PipelineConfig
    from ditto_spark.synth import generate_transcripts

    if args.synthetic:
        transcripts = generate_transcripts(spark, n_base=args.synthetic, seed=42)
    elif args.input:
        transcripts = spark.read.parquet(args.input)
    else:
        ap.error("one of --input or --synthetic is required")

    cfg = PipelineConfig(
        shingle_n=args.shingle_n,
        num_perm=args.num_perm,
        num_bands=args.num_bands,
        rows_per_band=args.rows_per_band,
        max_bucket=args.max_bucket,
        lsh_prefilter=args.lsh_prefilter,
        tau=args.tau,
        use_arrow_udf_scorer=not args.jvm_scorer,
    )
    store = StageStore(spark, args.output, args.run_id)
    res = dedup_transcripts_checkpointed(spark, transcripts, store, cfg)
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    n_entities = res.clusters.count()
    print(json.dumps({
        "run_id": args.run_id,
        "entities": n_entities,
        "clusters": n_clusters,
        "stages": [
            {k: r[k] for k in ("stage", "rows", "resumed") if k in r}
            for r in store.records
        ],
        "lineage": os.path.join(args.output, args.run_id, "_lineage.jsonl"),
    }))


if __name__ == "__main__":
    main()
