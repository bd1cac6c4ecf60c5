#!/usr/bin/env python
"""spark-submit entry point for the distributed Leiden pipeline.

Cluster deployment (north rule): package the library and submit the job
twice, at N and 4N executors, against the same input —

    ./scripts/package_pyfiles.sh              # → dist/leidenalg_spark.zip

    spark-submit \
      --master yarn --deploy-mode cluster \
      --num-executors 256 --executor-cores 4 --executor-memory 8g \
      --py-files dist/leidenalg_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.adaptive.skewJoin.enabled=true \
      --conf spark.sql.shuffle.partitions=2048 \
      scripts/submit_leiden.py \
      --input my_catalog.db.transcripts \
      --checkpoint s3a://bucket/leiden/run42 \
      --hub-salt 16 \
      --method modularity --n-iterations 2 --seed 42

Checkpoint roots may be any Hadoop-supported filesystem (s3a://,
hdfs://, gs://, local paths): CheckpointManager routes metadata
operations through the Hadoop FileSystem API, so --resume works across
submissions in any deploy mode.  --hub-salt k enables the skew-proof
salted superstep for graphs with tool-hub vertices (degree ~#convs).

The job reads transcripts (Iceberg table ref or parquet path), derives
the reply/tool-interaction edge table, runs Leiden, and writes
membership + quality + per-superstep metrics under --checkpoint.
Re-submitting with --resume continues from the latest complete
superstep checkpoint.  edges/sec/superstep from the metrics table at
the two executor counts gives the scaling-efficiency figure
(BENCH/BASELINE.md protocol).

Local smoke run (no cluster):
    python scripts/submit_leiden.py --synthetic 2000 --method cpm --gamma 0.5
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="transcripts: Iceberg table ref or parquet path")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic conversations instead of --input")
    ap.add_argument("--checkpoint", help="checkpoint root (Iceberg-or-parquet dir)")
    ap.add_argument("--output", help="membership sink (default: <checkpoint>/final)")
    ap.add_argument("--method", default="modularity",
                    choices=["modularity", "cpm", "rbconfiguration", "rber",
                             "significance", "surprise"])
    ap.add_argument("--gamma", type=float, default=1.0)
    ap.add_argument("--n-iterations", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--directed", action="store_true")
    ap.add_argument("--max-supersteps", type=int, default=30)
    ap.add_argument("--local-threshold", type=int, default=500_000)
    ap.add_argument("--hub-salt", type=int, default=0,
                    help="k>1 spreads each hub vertex's gather over k tasks "
                         "(tool vertices with degree ~#conversations)")
    ap.add_argument("--resume", action="store_true",
                    help="continue from the latest checkpointed superstep")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    # under spark-submit the session is configured by the submit command
    # (spark.master arrives via system properties); standalone runs fall
    # back to local[*] with the library defaults
    import os

    from pyspark import SparkConf

    builder = SparkSession.builder.appName("leidenalg-spark")
    if not SparkConf().contains("spark.master"):
        builder = (
            builder.master(os.environ.get("SPARK_MASTER", "local[*]"))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.ui.enabled", "false")
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from leidenalg_spark.operators.checkpoint import CheckpointManager
    from leidenalg_spark.operators.edges import transcripts_to_edges
    from leidenalg_spark.operators.leiden import leiden
    from leidenalg_spark.sources.tables import read_transcripts, write_table

    if args.synthetic:
        from leidenalg_spark.sources.transcripts import synthetic_transcripts

        transcripts = synthetic_transcripts(spark, n_convs=args.synthetic, seed=args.seed or 42)
    elif args.input:
        transcripts = read_transcripts(spark, args.input)
    else:
        ap.error("one of --input / --synthetic is required")

    edges = transcripts_to_edges(transcripts)
    ckpt = CheckpointManager(spark, path=args.checkpoint) if args.checkpoint else None
    res = leiden(
        spark, edges, method=args.method, gamma=args.gamma,
        n_iterations=args.n_iterations, seed=args.seed, directed=args.directed,
        max_supersteps=args.max_supersteps, local_threshold=args.local_threshold,
        ckpt=ckpt, resume=args.resume, hub_salt=args.hub_salt,
    )

    out = args.output or (f"{args.checkpoint}/final" if args.checkpoint else None)
    if out:
        write_table(res.membership, out, mode="overwrite")
    sup = [m for m in res.metrics if m.get("name") == "leiden_superstep"]
    print(json.dumps({
        "method": args.method, "gamma": args.gamma, "quality": res.quality,
        "supersteps": res.supersteps,
        "edges_per_sec": (
            round(sum(s["edges_per_sec"] for s in sup) / len(sup), 1) if sup else None
        ),
        "communities": res.membership.select("comm").distinct().count(),
        "output": out,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
