"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for the iterative join-aggregate workload of the graph kernels:
AQE on (runtime shuffle coalescing + skew-join splitting for hub
vertices), Arrow on (every pandas interchange is vectorised), and a
shuffle-partition count matched to the parallelism level so the two-
cluster-size scaling protocol (BASELINE.md) compares like with like.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app="leidenalg-spark", cores=None, shuffle_partitions=None, extra=None):
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    try:
        mem = f"{max(8, 2 * int(cores))}g"  # ~2 GB per core, like real executors
    except (TypeError, ValueError):
        mem = "16g"
    local_dir = "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else None
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or _default_partitions(cores)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", mem))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if local_dir:
        # shuffle files on tmpfs: a fixed-bandwidth spinning /tmp serialises
        # shuffles and destroys core scaling on a single box
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _default_partitions(cores):
    try:
        return max(2 * int(cores), 8)
    except (TypeError, ValueError):
        return 32
