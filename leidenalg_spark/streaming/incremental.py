"""Structured-Streaming ingestion for the transcript pipeline.

The reference is batch-only (SURVEY.md §2.6: streaming absent); at
10^12-turn scale, however, transcripts arrive continuously, so the engine
adds an incremental edge-derivation path: ``readStream`` over the
transcript table's directory → the same actor/consecutive-turn logic →
watermarked aggregation of edge weights → append/update sink.  Downstream
graph jobs then run on the *accumulated* edge table — communities are
recomputed per checkpointed batch, not per event (iterative global
algorithms are not expressible as a single continuous query).

The window-lag of the batch derivation is replaced by a stateful
self-join: turn k of a conversation joins turn k+1 within a watermark
horizon — the streaming-legal formulation of "consecutive rows".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.edges import TOOL_PREFIX, actor_expr


def read_transcript_stream(spark: SparkSession, path: str, schema=None) -> DataFrame:
    if schema is None:
        schema = (
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
        )
    return spark.readStream.schema(schema).parquet(path)


def streaming_edges(
    transcripts: DataFrame, watermark: str = "1 hour", max_turn_gap: str | None = None
) -> DataFrame:
    """Consecutive-turn + tool edges from a streaming transcript source.

    Stream-stream self-join on (conv_id, turn_idx == turn_idx+1) with a
    watermark bound on both sides; weights accumulate in an aggregation
    (update mode).  At scale the join state is bounded by the watermark —
    conversations are temporally local, so state stays small.

    ``max_turn_gap`` is the time-range bound of the join predicate —
    required for Spark to prune join state; consecutive turns further
    apart than this produce no edge (the batch derivation has no such
    bound, so pick it at or above the real inter-turn maximum).  Defaults
    to ``watermark`` so the two horizons agree unless told otherwise.
    """
    if max_turn_gap is None:
        max_turn_gap = watermark
    t = transcripts.withColumn("actor", actor_expr()).withWatermark("ts", watermark)
    prev = t.select(
        F.col("conv_id").alias("p_conv"),
        (F.col("turn_idx") + 1).alias("p_next"),
        F.col("actor").alias("src_name"),
        F.col("ts").alias("p_ts"),
    )
    cur = t.select(
        F.col("conv_id").alias("c_conv"),
        F.col("turn_idx").alias("c_idx"),
        F.col("actor").alias("dst_name"),
        F.col("ts").alias("c_ts"),
    )
    turn_edges = prev.join(
        cur,
        (F.col("p_conv") == F.col("c_conv"))
        & (F.col("p_next") == F.col("c_idx"))
        & (F.col("c_ts") >= F.col("p_ts"))
        & (F.col("c_ts") <= F.col("p_ts") + F.expr(f"interval {max_turn_gap}")),
    ).select("src_name", "dst_name")
    tool_edges = t.where((F.col("role") == "assistant") & F.col("tool").isNotNull()).select(
        F.col("actor").alias("src_name"),
        F.concat(F.lit(TOOL_PREFIX), F.col("tool")).alias("dst_name"),
    )
    return turn_edges.unionByName(tool_edges).where(F.col("src_name") != F.col("dst_name"))


def run_incremental(
    spark: SparkSession, in_path: str, checkpoint: str, out_path: str, n_buckets: int = 64
):
    """Incremental accumulation via ``foreachBatch`` merge — the
    production pattern for "streaming join feeds an ever-growing
    aggregate": the stream emits raw edge events (append-mode
    stream-stream join; a post-join aggregation would be held back by the
    watermark forever on historical data), and each micro-batch upserts
    its per-pair counts into the accumulated edge table.

    The accumulated table is hash-partitioned into ``n_buckets`` buckets
    on the edge key; a micro-batch reads back ONLY the buckets its keys
    touch, merges, and replaces exactly those partitions via dynamic
    partition overwrite — per-batch cost is O(touched buckets + batch),
    not O(total accumulated), and untouched buckets are never rewritten.

    ``foreachBatch`` is at-least-once: a crash between the data overwrite
    and the streaming-checkpoint commit replays the batch.  A per-batch
    commit marker (written AFTER the overwrite) makes the replay a no-op,
    so weights are not double-counted on restart.  The marker narrows the
    at-least-once window to the overwrite-vs-marker gap; true exactly-once
    needs a transactional sink (in production this merge is an Iceberg
    ``MERGE INTO``, whose snapshot commit closes that gap)."""
    import os

    edge_events = streaming_edges(read_transcript_stream(spark, in_path))

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        marker = os.path.join(out_path, "_commits", f"{batch_id}")
        if os.path.exists(marker):
            return  # replayed batch (at-least-once retry) — already merged
        inc = (
            batch_df.groupBy("src_name", "dst_name")
            .agg(F.count(F.lit(1)).cast("double").alias("weight"))
            .withColumn(
                "bucket", F.pmod(F.xxhash64("src_name", "dst_name"), F.lit(n_buckets))
            )
        ).persist()
        touched = [int(r["bucket"]) for r in inc.select("bucket").distinct().collect()]
        merged = inc
        if touched and os.path.exists(out_path):
            old = sess.read.parquet(out_path).where(F.col("bucket").isin(touched))
            merged = (
                old.select("src_name", "dst_name", "weight", "bucket")
                .unionByName(inc)
                .groupBy("bucket", "src_name", "dst_name")
                .agg(F.sum("weight").alias("weight"))
            )
        # break the read-from-out_path lineage before overwriting it
        merged = merged.localCheckpoint(eager=True)
        prev_mode = sess.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        sess.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy("bucket").parquet(out_path)
        finally:
            sess.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
        inc.unpersist()
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w") as f:
            f.write("committed\n")

    q = (
        edge_events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def run_streaming_decontaminate(
    spark: SparkSession,
    in_path: str,
    benchmark: DataFrame,
    checkpoint: str,
    out_path: str,
    n: int = 5,
    schema: str | None = None,
):
    """Stream-static decontamination filter: a ``readStream`` of documents
    is screened against a STATIC benchmark shingle set and only clean
    docs reach the sink — the streaming twin of
    :func:`leidenalg_spark.operators.dedup.decontaminate`.

    The benchmark side is computed ONCE (persisted) and broadcast into
    every micro-batch's shingle equality join — per-batch cost is
    O(batch shingles), independent of history.  The per-doc EXISTS
    reduction runs inside ``foreachBatch``: a stream anti-joined against
    its own exploded shingles would be a stream-stream anti join, which
    a single continuous query cannot express.  Replay-safe without
    commit markers — each micro-batch owns ``out_path/batch=<id>`` and
    overwrites it whole, so an at-least-once retry rewrites the same
    rows instead of duplicating them.
    """
    import os

    from ..operators.dedup import shingles

    if schema is None:
        schema = "doc_id bigint, text string"
    b_sh = shingles(benchmark, n).select("shingle").distinct().persist()
    b_sh.count()
    stream = spark.readStream.schema(schema).parquet(in_path)

    def screen_batch(batch_df: DataFrame, batch_id: int) -> None:
        bad = (
            shingles(batch_df, n)
            .join(F.broadcast(b_sh), "shingle", "left_semi")
            .select("doc_id")
            .distinct()
        )
        clean = batch_df.join(bad, "doc_id", "left_anti")
        clean.write.mode("overwrite").parquet(os.path.join(out_path, f"batch={batch_id}"))

    q = (
        stream.writeStream.foreachBatch(screen_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    b_sh.unpersist()
    return q
