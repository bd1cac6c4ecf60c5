"""Streaming trending top-k: watermarked windowed counts + per-window
rank — the continuous twin of
:func:`leidenalg_spark.operators.events.trending_topk`.

The windowed count runs in APPEND mode, so each window emits exactly
once, complete, when the watermark passes its end — which is what makes
the per-window rank correct inside ``foreachBatch`` (all of a window's
label rows arrive in the same micro-batch).  Update mode would stream
partial counts and ranks over partial counts are meaningless.

Terminal-window caveat (inherent to append mode): windows the watermark
has not passed never emit.  A pipeline that must flush on demand streams
one heartbeat event past the horizon (the tests do exactly this).

Replay-safe without commit markers: each micro-batch owns
``out_path/batch=<id>`` and overwrites it whole, so an at-least-once
retry rewrites the same rows instead of duplicating them (the
partition-ownership convention of ``run_streaming_decontaminate``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = "user_id bigint, ts timestamp, event_type string, event_id bigint, value double"


def run_trending(
    spark: SparkSession,
    in_path: str,
    checkpoint: str,
    out_path: str,
    width: str = "1 hour",
    slide: str | None = None,
    k: int = 3,
    watermark: str = "0 seconds",
    schema: str | None = None,
):
    """Process all available input (``availableNow``), appending the
    top-``k`` labels of every window the watermark has passed.  Call
    again after new files land to continue from the checkpoint."""
    from ..operators.events import window_expr

    stream = spark.readStream.schema(schema or EVENTS_SCHEMA).parquet(in_path)
    # shared validated constructor: slide > width raises here exactly as
    # in the batch twin, so the two paths can't silently diverge
    w = window_expr("ts", width, slide)
    counts = (
        stream.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )

    def rank_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        r = F.row_number().over(
            Window.partitionBy("window_start").orderBy(F.desc("n"), F.asc("event_type"))
        )
        out = batch_df.withColumn("rank", r.cast("long")).where(F.col("rank") <= k)
        out.write.mode("overwrite").parquet(os.path.join(out_path, f"batch={batch_id}"))

    q = (
        counts.writeStream.outputMode("append")
        .foreachBatch(rank_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
