"""Streaming DAU vs the batch twin: per-day distinct-actor counts from
the append-mode streaming aggregation must equal a plain batch
distinct count on the same input, across single and incremental runs."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from leidenalg_spark.streaming.dau import run_streaming_dau


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long, value double"
    )


def _batch_dau_closed(spark, path):
    # append-mode contract: a day only emits once the watermark passes
    # its END, so the trailing (still-open) day is legitimately absent
    df = spark.read.parquet(path)
    last = df.agg(F.max(F.date_trunc("day", "ts"))).collect()[0][0]
    return {
        (r.day, r.dau)
        for r in df.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").cast("long").alias("dau"))
        .where(F.col("day") < F.lit(last))
        .collect()
    }


def _streamed_dau(spark, out):
    return {
        (r.day, r.dau) for r in spark.read.parquet(out + "/dau").collect()
    }


def test_streaming_dau_matches_batch(spark, tmp_path):
    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(3):
        for u in range(d + 1):
            for k in range(2):
                rows.append((u, t0 + timedelta(days=d, hours=k), "view", eid, 0.0)); eid += 1
    in_dir = str(tmp_path / "in")
    _events(spark, rows).write.parquet(in_dir)
    out = str(tmp_path / "out")
    run_streaming_dau(spark, in_dir, str(tmp_path / "ckpt"), out)
    assert _streamed_dau(spark, out) == _batch_dau_closed(spark, in_dir)


def test_streaming_dau_incremental_runs_append_only(spark, tmp_path):
    t0 = datetime(2024, 1, 1)
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ckpt")
    first = [(u, t0 + timedelta(hours=u), "view", u, 0.0) for u in range(4)]
    _events(spark, first).write.parquet(in_dir)
    run_streaming_dau(spark, in_dir, ck, out)
    assert _streamed_dau(spark, out) == set()  # day 0 still open
    # a later day arrives: the watermark passes day 0's end and exactly
    # day 0 is emitted; the new (open) day stays in state
    second = [(u, t0 + timedelta(days=1, hours=u), "view", 100 + u, 0.0) for u in range(2)]
    _events(spark, second).write.mode("append").parquet(in_dir)
    run_streaming_dau(spark, in_dir, ck, out)
    assert _streamed_dau(spark, out) == {(t0, 4)}
    # and a third run after yet another day closes day 1
    third = [(0, t0 + timedelta(days=2), "view", 200, 0.0)]
    _events(spark, third).write.mode("append").parquet(in_dir)
    run_streaming_dau(spark, in_dir, ck, out)
    assert _streamed_dau(spark, out) == {(t0, 4), (t0 + timedelta(days=1), 2)}
