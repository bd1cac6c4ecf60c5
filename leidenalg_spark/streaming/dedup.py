"""Streaming exact dedup: first-occurrence-wins over an unbounded
document stream — the continuous twin of
:func:`leidenalg_spark.operators.dedup.dedup_exact` (same fingerprint,
shared via ``fingerprint_expr``).

Why not ``dropDuplicates`` on the stream: the built-in keeps unbounded
state in the streaming state store (one entry per key per executor,
RocksDB at best) and its keeper choice within a trigger is
arbitrary.  Here the seen-fingerprint set lives in a hash-bucketed
parquet table instead: per micro-batch the only state read is the
buckets the batch's fingerprints actually touch (partition-pruned), so
batch cost is O(batch + touched buckets), and the keeper rule is
deterministic — smallest doc_id within the batch, earliest batch across
batches.

Replay-safe WITHOUT commit markers: every state row carries the batch id
that first saw it (``first_batch``), and the anti-join only consults
rows with ``first_batch < current batch``.  An at-least-once replay of
batch k therefore ignores the state it wrote itself, recomputes the same
keepers, overwrites the same ``out_path/batch=k`` partition, and its
state append only duplicates (fingerprint, k) rows — which changes no
future anti-join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id bigint, text string"


def run_streaming_dedup(
    spark: SparkSession,
    in_path: str,
    checkpoint: str,
    out_path: str,
    state_path: str,
    n_buckets: int = 64,
    schema: str | None = None,
):
    """Process all available input (``availableNow``), appending one
    ``out_path/batch=<id>`` partition of first-seen keepers
    (doc_id, fingerprint) per micro-batch.  Call again after new files
    land to continue from the checkpoint."""
    from ..operators.dedup import fingerprint_expr

    stream = spark.readStream.schema(schema or DOCS_SCHEMA).parquet(in_path)

    def dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        keep = (
            batch_df.withColumn("fingerprint", fingerprint_expr("text"))
            .groupBy("fingerprint")
            .agg(F.min("doc_id").alias("doc_id"))
            .withColumn("bucket", F.pmod(F.xxhash64("fingerprint"), F.lit(n_buckets)))
        ).persist()
        touched = [int(r["bucket"]) for r in keep.select("bucket").distinct().collect()]
        dirs = [
            os.path.join(state_path, f"bucket={b}")
            for b in touched
            if os.path.isdir(os.path.join(state_path, f"bucket={b}"))
        ]
        new = keep
        if dirs:
            seen = (
                sess.read.option("basePath", state_path)
                .parquet(*dirs)
                .where(F.col("first_batch") < F.lit(int(batch_id)))
            )
            new = keep.join(seen.select("fingerprint"), "fingerprint", "left_anti")
        new = new.persist()
        new.select("doc_id", "fingerprint").write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={batch_id}")
        )
        (
            new.select("fingerprint", "bucket")
            .withColumn("first_batch", F.lit(int(batch_id)))
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(state_path)
        )
        new.unpersist()
        keep.unpersist()

    q = (
        stream.writeStream.foreachBatch(dedup_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
