"""Streaming anomaly detection: watermarked tumbling-window counts +
trailing z-score against the accumulated per-label history — the
continuous twin of :func:`leidenalg_spark.operators.events.anomaly_windows`.

The windowed count runs in APPEND mode (each window emits exactly once,
complete, when the watermark passes its end), so a window's z-score can
be finalised the moment it arrives in ``foreachBatch``.  The trailing
baseline needs the previous ``baseline`` observed windows per label;
append-mode ordering guarantees every earlier window of the same label
was emitted in an earlier micro-batch or the same one (earlier windows
have earlier ends, so the watermark passes them no later) — so scoring
against history ∪ current-batch reproduces the batch twin exactly,
asserted in tests.

State = the emitted (window_start, label, n) count table — already
collapsed to |labels|·|windows| rows, never events.  It is persisted
under ``out_path/history/batch=<id>`` with the same per-batch
partition-ownership convention as the scored output
(``out_path/scored/batch=<id>``): an at-least-once replay overwrites
its own partition instead of duplicating rows.  At production scale,
prune history on read to the newest ``baseline`` windows per label
(the older rows can never affect a future score).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = "user_id bigint, ts timestamp, event_type string, event_id bigint, value double"


def run_anomaly(
    spark: SparkSession,
    in_path: str,
    checkpoint: str,
    out_path: str,
    width: str = "1 hour",
    baseline: int = 6,
    threshold: float = 3.0,
    watermark: str = "0 seconds",
    schema: str | None = None,
):
    """Process all available input (``availableNow``), scoring every
    window the watermark has passed against its trailing per-label
    baseline.  Call again after new files land to continue from the
    checkpoint — scores are final on emit and never revised."""
    from ..operators.events import window_expr

    stream = spark.readStream.schema(schema or EVENTS_SCHEMA).parquet(in_path)
    w = window_expr("ts", width, None)
    counts = (
        stream.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    hist_path = os.path.join(out_path, "history")
    scored_path = os.path.join(out_path, "scored")

    def score_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        batch_df = batch_df.localCheckpoint(eager=True)
        try:
            history = spark.read.parquet(hist_path).select(
                "window_start", "event_type", "n"
            )
        except Exception:
            history = None
        if history is not None:
            # replay guard: a retried batch already wrote its history
            # partition — drop its keys so the union never double-counts
            history = history.join(
                batch_df.select("window_start", "event_type"),
                ["window_start", "event_type"],
                "left_anti",
            )
            allrows = batch_df.unionByName(history)
        else:
            allrows = batch_df
        trail = (
            Window.partitionBy("event_type")
            .orderBy("window_start")
            .rowsBetween(-baseline, -1)
        )
        mu = F.avg("n").over(trail)
        sd = F.stddev_samp("n").over(trail)
        z = F.when(sd > 0, (F.col("n") - mu) / sd)
        scored = allrows.select(
            "window_start",
            "event_type",
            "n",
            F.round(mu, 6).alias("baseline_mean"),
            F.round(z, 6).alias("zscore"),
            F.coalesce(F.abs(z) >= F.lit(float(threshold)), F.lit(False)).alias(
                "is_anomaly"
            ),
        ).join(
            batch_df.select("window_start", "event_type"),
            ["window_start", "event_type"],
            "semi",
        )
        scored.write.mode("overwrite").parquet(
            os.path.join(scored_path, f"batch={batch_id}")
        )
        batch_df.write.mode("overwrite").parquet(
            os.path.join(hist_path, f"batch={batch_id}")
        )

    q = (
        counts.writeStream.outputMode("append")
        .foreachBatch(score_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
