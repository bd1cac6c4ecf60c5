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
    and the streaming-checkpoint commit replays the batch.  Two sinks:

    - **parquet path** (``out_path`` contains ``/``, or is a bare
      dot-free relative name): a per-batch commit
      marker written AFTER the overwrite makes a replay a no-op.  The
      marker narrows the at-least-once window to the overwrite-vs-marker
      gap — a crash exactly between them double-counts on replay
      (documented residual; see the crash-injection tests).
    - **Iceberg table ref** (``catalog.db.table``): exactly-once.  The
      batch id rides the SAME atomic snapshot as the data — the
      ``overwritePartitions`` commit carries a
      ``snapshot-property.streaming-batch-id`` write option, so "data
      committed" and "batch marked done" cannot diverge; the replay
      check reads the committed ``{ref}.snapshots`` metadata.  (Not
      ``MERGE INTO``: SQL merge cannot attach snapshot properties, so
      its commit and any marker would again be two operations — the
      very gap being closed.  ``overwritePartitions`` over bucketed
      keys expresses the identical upsert row-set atomically.)
    """
    import os

    edge_events = streaming_edges(read_transcript_stream(spark, in_path))
    from ..sources.tables import is_table_ref, iceberg_available

    # sink dispatch, resolved ONCE up front (not per batch): the Iceberg
    # path needs the ref's catalog to actually resolve — a slash-free
    # string alone is ambiguous.  A dotted slash-free name with no
    # configured catalog is almost certainly a typo'd table ref, so fail
    # fast with the fix; a bare name without dots is a relative parquet
    # directory (the historic contract).
    if iceberg_available(spark, out_path):
        sink = "iceberg"
    elif is_table_ref(out_path) and "." in out_path:
        catalog = out_path.split(".", 1)[0]
        raise ValueError(
            f"out_path={out_path!r} looks like an Iceberg table ref but "
            f"spark.sql.catalog.{catalog} is not configured — configure the "
            "catalog, or pass a filesystem path (containing a '/') for the "
            "parquet sink"
        )
    else:
        sink = "parquet"

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        inc = (
            batch_df.groupBy("src_name", "dst_name")
            .agg(F.count(F.lit(1)).cast("double").alias("weight"))
            .withColumn(
                "bucket", F.pmod(F.xxhash64("src_name", "dst_name"), F.lit(n_buckets))
            )
        )
        if sink == "iceberg":
            _merge_batch_iceberg(sess, inc, out_path, batch_id, n_buckets)
        else:
            _merge_batch_parquet(sess, inc, out_path, batch_id)

    q = (
        edge_events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _merge_batch_parquet(
    sess: SparkSession, inc: DataFrame, out_path: str, batch_id: int,
    _crash_before_marker: bool = False,
) -> None:
    """Marker-guarded bucketed upsert of one micro-batch (parquet sink).

    ``_crash_before_marker`` is the crash-injection hook for tests: raise
    after the data overwrite but before the marker — the documented
    at-least-once window of this sink."""
    import os

    marker = os.path.join(out_path, "_commits", f"{batch_id}")
    if os.path.exists(marker):
        return  # replayed batch (at-least-once retry) — already merged
    inc = inc.persist()
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
    if _crash_before_marker:
        raise RuntimeError("injected crash between overwrite and marker")
    os.makedirs(os.path.dirname(marker), exist_ok=True)
    with open(marker, "w") as f:
        f.write("committed\n")


BATCH_ID_PROP = "streaming-batch-id"


def iceberg_batch_committed(sess: SparkSession, ref: str, batch_id: int) -> bool:
    """True when a snapshot of ``ref`` already carries this batch id in its
    summary — i.e. the batch's merge COMMITTED before a crash/replay."""
    if not sess.catalog.tableExists(ref):
        return False
    n = (
        sess.sql(f"SELECT summary FROM {ref}.snapshots")
        .where(F.element_at(F.col("summary"), BATCH_ID_PROP) == str(int(batch_id)))
        .count()
    )
    return n > 0


def _merge_batch_iceberg(
    sess: SparkSession, inc: DataFrame, ref: str, batch_id: int, n_buckets: int
) -> None:
    """Exactly-once upsert of one micro-batch into an Iceberg table.

    The accumulated table is partitioned by the same ``bucket`` column as
    the parquet sink, so the merge stays O(touched buckets + batch):
    read back only the touched buckets (snapshot-isolated), re-aggregate,
    ``overwritePartitions`` — ONE atomic snapshot commit that also
    carries ``snapshot-property.streaming-batch-id=<id>``, making the
    replay check (:func:`iceberg_batch_committed`) transactional with the
    data.  A crash at ANY point either left no snapshot (replay redoes
    the whole merge against the pre-batch snapshot — same result) or a
    snapshot with the batch id (replay is a no-op): no double-count
    window exists, unlike the parquet marker."""
    if iceberg_batch_committed(sess, ref, batch_id):
        return
    inc = inc.persist()
    touched = [int(r["bucket"]) for r in inc.select("bucket").distinct().collect()]
    merged = inc
    if sess.catalog.tableExists(ref):
        old = sess.read.table(ref).where(F.col("bucket").isin(touched))
        merged = (
            old.select("src_name", "dst_name", "weight", "bucket")
            .unionByName(inc)
            .groupBy("bucket", "src_name", "dst_name")
            .agg(F.sum("weight").alias("weight"))
        )
        # Iceberg reads are snapshot-isolated, but break the self-read
        # lineage anyway so the overwrite never races its own scan
        merged = merged.localCheckpoint(eager=True)
        (
            merged.select("src_name", "dst_name", "weight", "bucket")
            .writeTo(ref)
            .option(f"snapshot-property.{BATCH_ID_PROP}", str(int(batch_id)))
            .overwritePartitions()
        )
    else:
        (
            merged.select("src_name", "dst_name", "weight", "bucket")
            .writeTo(ref)
            .partitionedBy(F.col("bucket"))
            .option(f"snapshot-property.{BATCH_ID_PROP}", str(int(batch_id)))
            .using("iceberg")
            .create()
        )
    inc.unpersist()


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
