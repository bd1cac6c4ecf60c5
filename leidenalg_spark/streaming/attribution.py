"""Streaming attribution pairing: the canonical stream–stream
WATERMARKED INTERVAL JOIN (Structured Streaming's hardest built-in
pattern, exercised here on the ad-attribution shape that motivated it).

Two filtered views of ONE event stream — conversions and touchpoints —
join per user under a time-range predicate: a (touch, conversion) pair
is emitted when the touch precedes the conversion by at most
``window_s`` seconds.  This is the STREAMING twin of the pairing stage
inside :func:`leidenalg_spark.operators.events.attribution`: the batch
op ranks/splits credit over these same pairs, so a downstream
``foreachBatch`` can apply any credit model incrementally.

Correctness mechanics (the part people get wrong):

- BOTH sides carry watermarks, and the join condition bounds touch_ts
  relative to conv_ts on both ends — without the lower bound Spark
  would have to retain every touch forever; with it, state for a touch
  is dropped once the watermark passes ``touch_ts + window_s``.
- Inner join + append mode: a pair emits exactly once, when both sides
  have arrived and the range predicate holds.  Late rows within the
  watermark still pair; rows later than the watermark are dropped by
  contract (the documented, bounded-state trade).

Scale notes: state is O(events inside the watermark horizon) per side,
hash-partitioned by user_id — the same key both inputs are naturally
clustered by; no global state, no driver participation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = "user_id bigint, ts timestamp, event_type string, event_id bigint, value double"


def run_streaming_attribution(
    spark: SparkSession,
    in_path: str,
    checkpoint: str,
    out_path: str,
    conversion_type: str = "purchase",
    window_s: float = 3600.0,
    watermark: str = "0 seconds",
    schema: str | None = None,
) -> str:
    """Process all available input (``availableNow``); every attributed
    (touch, conversion) pair lands exactly once in ``out_path/pairs`` as
    (user_id, conv_ts, touch_ts, touch_type).  Call again after new
    files arrive to continue from the checkpoint without re-emitting."""
    stream = spark.readStream.schema(schema or EVENTS_SCHEMA).parquet(in_path)
    conv = (
        stream.where(F.col("event_type") == conversion_type)
        .select(F.col("user_id").alias("cu"), F.col("ts").alias("conv_ts"))
        .withWatermark("conv_ts", watermark)
    )
    touch = (
        stream.where(F.col("event_type") != conversion_type)
        .select(
            F.col("user_id").alias("tu"),
            F.col("ts").alias("touch_ts"),
            F.col("event_type").alias("touch_type"),
        )
        .withWatermark("touch_ts", watermark)
    )
    joined = touch.join(
        conv,
        F.expr(
            f"tu = cu AND touch_ts < conv_ts "
            f"AND touch_ts >= conv_ts - INTERVAL {int(window_s)} SECONDS"
        ),
        "inner",
    ).select(
        F.col("cu").alias("user_id"), "conv_ts", "touch_ts", "touch_type"
    )
    pairs_path = os.path.join(out_path, "pairs")
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", pairs_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return pairs_path


def batch_attribution_pairs(
    events: DataFrame, conversion_type: str = "purchase", window_s: float = 3600.0
) -> DataFrame:
    """Batch twin of the streaming join (same predicate, no state):
    the equality oracle the streaming tests compare against."""
    conv = events.where(F.col("event_type") == conversion_type).select(
        F.col("user_id").alias("cu"), F.col("ts").alias("conv_ts")
    )
    touch = events.where(F.col("event_type") != conversion_type).select(
        F.col("user_id").alias("tu"),
        F.col("ts").alias("touch_ts"),
        F.col("event_type").alias("touch_type"),
    )
    return (
        touch.join(
            conv,
            (F.col("tu") == F.col("cu"))
            & (F.col("touch_ts") < F.col("conv_ts"))
            & (F.col("touch_ts") >= F.col("conv_ts") - F.expr(f"INTERVAL {int(window_s)} SECONDS")),
        )
        .select(F.col("cu").alias("user_id"), "conv_ts", "touch_ts", "touch_type")
    )
