"""Streaming MinHash near-dup admission: the continuous twin of
:func:`leidenalg_spark.operators.dedup.online_neardup_filter` (same band
keys via ``minhash_band_keys``, same greedy first-wins-by-id semantics).

State = the (band, key) set of every ADMITTED document, hash-bucketed
parquet exactly like the exact-dedup state (``streaming/dedup.py``): a
micro-batch reads back only the buckets its own band keys touch, so
per-batch cost is O(batch + touched buckets), never O(history).

Replay-safe without commit markers, same argument as streaming dedup:
state rows carry ``first_batch`` and the history consult filters
``first_batch < current``, so a replayed batch ignores its own writes,
recomputes the same admissions, and overwrites the same output
partition.

With ascending doc_ids across batches the multi-batch run admits
EXACTLY the set the single-batch greedy admits (batch-equality tested):
the greedy scan order is doc_id order either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = "doc_id bigint, text string"


def run_streaming_neardup(
    spark: SparkSession,
    in_path: str,
    checkpoint: str,
    out_path: str,
    state_path: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    n_buckets: int = 64,
    schema: str | None = None,
):
    """Process all available input (``availableNow``), writing one
    ``out_path/batch=<id>`` partition of (doc_id, admitted) per
    micro-batch and appending admitted docs' band keys to the bucketed
    state.  Call again after new files land to continue."""
    from ..operators.dedup import minhash_band_keys, online_neardup_filter

    stream = spark.readStream.schema(schema or DOCS_SCHEMA).parquet(in_path)

    def admit_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        bk = minhash_band_keys(batch_df, n, num_hashes, bands).withColumn(
            "bucket", F.pmod(F.xxhash64("band", "key"), F.lit(n_buckets))
        ).persist()
        touched = [int(r["bucket"]) for r in bk.select("bucket").distinct().collect()]
        dirs = [
            os.path.join(state_path, f"bucket={b}")
            for b in touched
            if os.path.isdir(os.path.join(state_path, f"bucket={b}"))
        ]
        seen = None
        if dirs:
            seen = (
                sess.read.option("basePath", state_path)
                .parquet(*dirs)
                .where(F.col("first_batch") < F.lit(int(batch_id)))
            )
        flags = online_neardup_filter(
            batch_df, n=n, num_hashes=num_hashes, bands=bands, seen=seen
        ).persist()
        flags.write.mode("overwrite").parquet(os.path.join(out_path, f"batch={batch_id}"))
        admitted_keys = (
            bk.join(flags.where("admitted").select("doc_id"), "doc_id", "semi")
            .select("band", "key", "bucket")
            .distinct()
            .withColumn("first_batch", F.lit(int(batch_id)))
        )
        (
            admitted_keys.repartition("bucket")
            .write.mode("append")
            .partitionBy("bucket")
            .parquet(state_path)
        )
        bk.unpersist()
        flags.unpersist()

    q = (
        stream.writeStream.foreachBatch(admit_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
