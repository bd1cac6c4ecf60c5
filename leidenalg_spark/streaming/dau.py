"""Streaming daily active users (DAU): watermarked per-(day, actor)
aggregation emitting each day's distinct-actor count exactly once —
the continuous twin of the batch ``stickiness`` dau column.

Shape: the streaming groupBy(window('1 day'), user_id) runs in APPEND
mode, so a (day, actor) row is emitted exactly once, when the watermark
passes the day's end — which means every pair belonging to a day
arrives in the SAME micro-batch (all are released by the same watermark
crossing).  The ``foreachBatch`` handler therefore needs NO cross-batch
state of its own: each batch's days are complete, and one distinct
count per day finishes the job.  Replays overwrite their own
``batch=<id>`` partition (the repo's at-least-once convention), so
reruns are idempotent.

State is Spark's own streaming-aggregation store, keyed by
(day, actor) — linear in ACTIVE pairs inside the watermark horizon,
never in events; at 10^12 turns the horizon bound is what keeps the
store finite, exactly like the sessionization operator.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = "user_id bigint, ts timestamp, event_type string, event_id bigint, value double"


def run_streaming_dau(
    spark: SparkSession,
    in_path: str,
    checkpoint: str,
    out_path: str,
    watermark: str = "0 seconds",
    schema: str | None = None,
):
    """Process all available input (``availableNow``); each completed
    day lands once in ``out_path/dau/batch=<id>`` as (day, dau,
    n_events).  Call again after new files arrive to continue from the
    checkpoint."""
    stream = spark.readStream.schema(schema or EVENTS_SCHEMA).parquet(in_path)
    pairs = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(F.col("w.start").alias("day"), "user_id", "n_events")
    )
    dau_path = os.path.join(out_path, "dau")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df.groupBy("day").agg(
            F.countDistinct("user_id").cast("long").alias("dau"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        out.write.mode("overwrite").parquet(os.path.join(dau_path, f"batch={batch_id}"))

    q = (
        pairs.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .foreachBatch(handle)
        .start()
    )
    q.awaitTermination()
    return dau_path
