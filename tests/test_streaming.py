"""Structured-Streaming incremental edge derivation: the streaming result
must equal the batch derivation on the same input."""

from pyspark.sql import functions as F

from leidenalg_spark.operators.edges import derive_named_edges
from leidenalg_spark.sources.transcripts import synthetic_transcripts
from leidenalg_spark.streaming.incremental import run_incremental


def test_streaming_edges_match_batch(spark, tmp_path):
    t = synthetic_transcripts(spark, n_convs=30, max_turns=10, seed=42)
    in_dir = str(tmp_path / "in")
    t.write.parquet(in_dir)

    out = str(tmp_path / "edges_acc")
    run_incremental(spark, in_dir, str(tmp_path / "ckpt"), out)
    got = spark.read.parquet(out).toPandas()
    exp = derive_named_edges(spark.read.parquet(in_dir)).toPandas()

    key = ["src_name", "dst_name"]
    g = got.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    assert len(g) == len(e)
    merged = g.merge(e, on=key, suffixes=("_s", "_b"))
    assert len(merged) == len(e)
    assert (merged["weight_s"] == merged["weight_b"]).all()


def test_streaming_second_batch_accumulates(spark, tmp_path):
    # batch 1: conversations 0..19; batch 2: 20..39 arrive later;
    # accumulated edge table must equal the batch derivation on the union
    t_all = synthetic_transcripts(spark, n_convs=40, max_turns=8, seed=7).persist()
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "edges_acc")
    ckpt = str(tmp_path / "ckpt")

    t_all.where("conv_id < 'conv_00000020'").write.mode("append").parquet(in_dir)
    run_incremental(spark, in_dir, ckpt, out)
    n_first = len(spark.read.parquet(out).toPandas())

    t_all.where("conv_id >= 'conv_00000020'").write.mode("append").parquet(in_dir)
    run_incremental(spark, in_dir, ckpt, out)

    got = spark.read.parquet(out).toPandas().sort_values(["src_name", "dst_name"]).reset_index(drop=True)
    exp = (
        derive_named_edges(spark.read.parquet(in_dir))
        .toPandas()
        .sort_values(["src_name", "dst_name"])
        .reset_index(drop=True)
    )
    assert len(got) > n_first  # second batch actually added edges
    assert len(got) == len(exp)
    m = got.merge(exp, on=["src_name", "dst_name"], suffixes=("_s", "_b"))
    assert (m["weight_s"] == m["weight_b"]).all()


def test_streaming_decontaminate_matches_batch(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import functions as F

    from leidenalg_spark.operators.dedup import decontaminate
    from leidenalg_spark.streaming.incremental import run_streaming_decontaminate

    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "a completely different sentence about spark partitions and shuffles",
        "numbers one two three four five six seven eight nine ten",
        "der schnelle braune fuchs springt heute nacht wieder los",
    ]
    rows = [(i, base[i % 4] + f" tail {i % 3}") for i in range(40)]
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    bench = docs.where(F.col("doc_id") % 10 == 0).persist()

    in_dir, out, ckpt = (str(tmp_path / p) for p in ("in", "clean", "ckpt"))
    docs.where("doc_id < 20").write.mode("append").parquet(in_dir)
    run_streaming_decontaminate(spark, in_dir, bench, ckpt, out)
    got1 = set(spark.read.parquet(out).toPandas()["doc_id"])

    # second micro-batch arrives later; accumulated clean set must equal
    # the batch operator over the full input
    docs.where("doc_id >= 20").write.mode("append").parquet(in_dir)
    run_streaming_decontaminate(spark, in_dir, bench, ckpt, out)
    got = set(spark.read.parquet(out).toPandas()["doc_id"])
    assert got1 <= got

    exp_df = decontaminate(docs, bench, n=5).toPandas()
    exp = set(exp_df[~exp_df["contaminated"]]["doc_id"])
    assert got == exp
    assert len(exp) > 0 and len(exp) < 40  # the filter actually removed docs
    bench.unpersist()


def test_streaming_trending_matches_batch(spark, tmp_path):
    import datetime as dt

    import pandas as pd
    from leidenalg_spark.operators.events import trending_topk
    from leidenalg_spark.streaming.trending import run_trending

    def _ts(s):
        return dt.datetime.fromisoformat(s)

    rows = []
    # window [00:00, 01:00): a x3, b x2, c x1; [01:00, 02:00): b x2, c x1
    for i, (t, lab) in enumerate([
        ("2024-01-01 00:05:00", "a"), ("2024-01-01 00:10:00", "a"),
        ("2024-01-01 00:15:00", "a"), ("2024-01-01 00:20:00", "b"),
        ("2024-01-01 00:25:00", "b"), ("2024-01-01 00:30:00", "c"),
        ("2024-01-01 01:05:00", "b"), ("2024-01-01 01:10:00", "b"),
        ("2024-01-01 01:15:00", "c"),
    ]):
        rows.append((i, _ts(t), lab, i, 1.0))
    # heartbeat far past the horizon flushes both real windows (its own
    # window stays pending — the documented append-mode caveat)
    rows.append((99, _ts("2024-01-02 00:00:00"), "___flush", 99, 0.0))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type", "event_id", "value"])
    ev = spark.createDataFrame(pdf)
    in_dir = str(tmp_path / "in")
    ev.write.parquet(in_dir)

    run_trending(spark, in_dir, str(tmp_path / "ckpt"), str(tmp_path / "out"), k=2)
    got = (
        spark.read.parquet(str(tmp_path / "out"))
        .select("window_start", "event_type", "n", "rank")
        .toPandas().sort_values(["window_start", "rank"]).reset_index(drop=True)
    )
    exp = (
        trending_topk(ev.where(F.col("event_type") != "___flush"), k=2)
        .select("window_start", F.col("event_type"), "n", "rank")
        .toPandas().sort_values(["window_start", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    # and the ranks themselves are the planted truth
    assert list(exp["event_type"]) == ["a", "b", "b", "c"]


def test_streaming_anomaly_matches_batch(spark, tmp_path):
    import datetime as dt

    import pandas as pd
    from leidenalg_spark.operators.events import anomaly_windows
    from leidenalg_spark.streaming.anomaly import run_anomaly

    def _ts(s):
        return dt.datetime.fromisoformat(s)

    rows = []
    i = 0
    # alternating 4/6 hourly baseline then a 30-count spike in hour 6
    for h, k in enumerate([4, 6, 4, 6, 4, 6, 30]):
        for j in range(k):
            rows.append((i, _ts(f"2024-01-01 0{h}:{j % 60:02d}:00"), "click", i, 1.0))
            i += 1
    rows.append((999, _ts("2024-01-03 00:00:00"), "___flush", 999, 0.0))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_type", "event_id", "value"])
    ev = spark.createDataFrame(pdf)
    in_dir = str(tmp_path / "in")
    ev.write.parquet(in_dir)

    run_anomaly(
        spark, in_dir, str(tmp_path / "ckpt"), str(tmp_path / "out"),
        baseline=6, threshold=3.0,
    )
    cols = ["window_start", "event_type", "n", "baseline_mean", "zscore", "is_anomaly"]
    got = (
        spark.read.parquet(str(tmp_path / "out" / "scored"))
        .where(F.col("event_type") != "___flush").select(*cols)
        .toPandas().sort_values(["event_type", "window_start"]).reset_index(drop=True)
    )
    exp = (
        anomaly_windows(
            ev.where(F.col("event_type") != "___flush"), baseline=6, threshold=3.0
        )
        .select(*cols)
        .toPandas().sort_values(["event_type", "window_start"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert bool(got.loc[got["n"] == 30, "is_anomaly"].iloc[0])


def test_streaming_anomaly_incremental_runs_match_one_shot(spark, tmp_path):
    """Scores finalised across TWO separate availableNow runs (history
    carried through the per-batch partitions) equal the one-shot batch
    twin over the full stream."""
    import datetime as dt

    import pandas as pd
    from leidenalg_spark.operators.events import anomaly_windows
    from leidenalg_spark.streaming.anomaly import run_anomaly

    def _ts(s):
        return dt.datetime.fromisoformat(s)

    def mk(rows, counts, h0):
        i = len(rows) * 1000
        for h, k in enumerate(counts):
            for j in range(k):
                rows.append((i, _ts(f"2024-01-01 0{h0 + h}:{j % 60:02d}:00"), "e", i, 1.0))
                i += 1
        return rows

    in_dir = str(tmp_path / "in")
    first = mk([], [5, 7, 5], 0)
    first.append((1, _ts("2024-01-01 04:00:00"), "___flush", 1, 0.0))
    pd1 = pd.DataFrame(first, columns=["user_id", "ts", "event_type", "event_id", "value"])
    spark.createDataFrame(pd1).write.mode("append").parquet(in_dir)
    run_anomaly(spark, in_dir, str(tmp_path / "ckpt"), str(tmp_path / "out"), baseline=3)

    second = mk([], [7, 5, 40], 5)
    second.append((2, _ts("2024-01-02 00:00:00"), "___flush2", 2, 0.0))
    pd2 = pd.DataFrame(second, columns=["user_id", "ts", "event_type", "event_id", "value"])
    spark.createDataFrame(pd2).write.mode("append").parquet(in_dir)
    run_anomaly(spark, in_dir, str(tmp_path / "ckpt"), str(tmp_path / "out"), baseline=3)

    cols = ["window_start", "event_type", "n", "baseline_mean", "zscore", "is_anomaly"]
    got = (
        spark.read.parquet(str(tmp_path / "out" / "scored"))
        .where(~F.col("event_type").startswith("___")).select(*cols)
        .toPandas().sort_values("window_start").reset_index(drop=True)
    )
    full = spark.read.parquet(in_dir).where(~F.col("event_type").startswith("___"))
    exp = (
        anomaly_windows(full, baseline=3).select(*cols)
        .toPandas().sort_values("window_start").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
    assert bool(got.loc[got["n"] == 40, "is_anomaly"].iloc[0])


def test_streaming_attribution_matches_batch_and_is_incremental(spark, tmp_path):
    """Stream-stream interval join equals the batch predicate join, and
    a second availableNow run over appended files emits only new pairs
    (exactly-once across restarts)."""
    from datetime import datetime, timedelta

    from leidenalg_spark.streaming.attribution import (
        batch_attribution_pairs, run_streaming_attribution,
    )

    t0 = datetime(2024, 1, 1)
    in_path = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def ev(uid, secs, typ, eid):
        return (uid, t0 + timedelta(seconds=secs), typ, eid, 0.0)

    first = [
        ev(1, 0, "ad", 1), ev(1, 100, "email", 2), ev(1, 200, "purchase", 3),
        ev(2, 0, "ad", 4),              # never converts
        ev(3, 0, "ad", 5), ev(3, 5000, "purchase", 6),  # outside 3600s window
    ]
    sch = "user_id long, ts timestamp, event_type string, event_id long, value double"
    spark.createDataFrame(first, sch).write.mode("append").parquet(in_path)
    pairs_path = run_streaming_attribution(spark, in_path, ck, out)

    def got():
        return {
            (r.user_id, r.conv_ts, r.touch_ts, r.touch_type)
            for r in spark.read.parquet(pairs_path).collect()
        }

    def want():
        return {
            (r.user_id, r.conv_ts, r.touch_ts, r.touch_type)
            for r in batch_attribution_pairs(spark.read.parquet(in_path)).collect()
        }

    assert got() == want()
    assert len(got()) == 2  # user 1's two touches; user 3 out of window

    # append new data AHEAD of the advanced watermark (the first run
    # moved it to the max seen event time; with watermark "0 seconds"
    # anything at-or-behind it is dropped as late by contract): the new
    # in-window pair emits, the first run's pairs do NOT re-emit
    second = [ev(4, 6000, "ad", 7), ev(4, 6050, "purchase", 8)]
    spark.createDataFrame(second, sch).write.mode("append").parquet(in_path)
    run_streaming_attribution(spark, in_path, ck, out)
    after = got()
    assert (4, t0 + timedelta(seconds=6050), t0 + timedelta(seconds=6000), "ad") in after
    assert len(after) == 3  # the first run's pairs exactly once


def test_merge_batch_parquet_crash_injection(spark, tmp_path):
    """Crash-injection for the parquet sink's at-least-once contract:
    (a) crash AFTER marker -> replay is a no-op (no double count);
    (b) crash BETWEEN overwrite and marker -> replay double-counts —
    the documented residual window the Iceberg sink closes."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from leidenalg_spark.streaming.incremental import _merge_batch_parquet

    out = str(tmp_path / "acc")

    def inc_df():
        return spark.createDataFrame(
            [("a", "b", 1.0, 0), ("c", "d", 2.0, 1)],
            "src_name string, dst_name string, weight double, bucket long",
        )

    def total():
        return (
            spark.read.parquet(out).agg(F.sum("weight")).first()[0]
        )

    _merge_batch_parquet(spark, inc_df(), out, batch_id=0)
    assert total() == 3.0
    # (a) marker exists -> replay no-op
    _merge_batch_parquet(spark, inc_df(), out, batch_id=0)
    assert total() == 3.0
    # (b) the gap: overwrite lands, marker does not
    with _pytest.raises(RuntimeError, match="injected crash"):
        _merge_batch_parquet(spark, inc_df(), out, batch_id=1, _crash_before_marker=True)
    assert total() == 6.0  # data landed
    _merge_batch_parquet(spark, inc_df(), out, batch_id=1)  # replay
    assert total() == 9.0, "parquet sink double-counts in the gap (documented)"


def test_merge_batch_iceberg_exactly_once(spark, tmp_path):
    """Exactly-once on the Iceberg sink: the batch id rides the data
    snapshot, so a replay at ANY crash point is either a full redo
    against the pre-batch snapshot or a no-op.  Runs only when an
    Iceberg catalog is configured (no runtime jar in this sandbox)."""
    import pytest as _pytest

    from leidenalg_spark.sources.tables import iceberg_available
    from leidenalg_spark.streaming.incremental import (
        _merge_batch_iceberg,
        iceberg_batch_committed,
    )

    ref = "ice.db.edges_acc"
    if not iceberg_available(spark, ref):
        _pytest.skip("no Iceberg catalog configured in this environment")
    from pyspark.sql import functions as F

    def inc_df():
        return spark.createDataFrame(
            [("a", "b", 1.0, 0)],
            "src_name string, dst_name string, weight double, bucket long",
        )

    _merge_batch_iceberg(spark, inc_df(), ref, batch_id=0, n_buckets=4)
    assert iceberg_batch_committed(spark, ref, 0)
    _merge_batch_iceberg(spark, inc_df(), ref, batch_id=0, n_buckets=4)  # replay
    assert spark.read.table(ref).agg(F.sum("weight")).first()[0] == 1.0

def test_run_incremental_sink_dispatch(spark, tmp_path, monkeypatch):
    """ADVICE r3: a bare dot-free relative name is a PARQUET sink (the
    historic contract), and a dotted slash-free name whose catalog is not
    configured fails fast with the fix instead of a late
    catalog-resolution error."""
    import os

    import pytest

    t = synthetic_transcripts(spark, n_convs=5, max_turns=6, seed=3)
    in_dir = str(tmp_path / "in")
    t.write.parquet(in_dir)
    # capture which sink the bare name routes to (a relative JVM-side
    # write would land outside tmp_path, so don't actually write)
    import leidenalg_spark.streaming.incremental as inc_mod

    calls = []
    # the stub must still consume the micro-batch: every state-store
    # partition has to commit or the query fails validation
    monkeypatch.setattr(
        inc_mod, "_merge_batch_parquet",
        lambda sess, inc, out, bid: (inc.count(), calls.append(("parquet", out))),
    )
    monkeypatch.setattr(
        inc_mod, "_merge_batch_iceberg",
        lambda sess, inc, out, bid, nb: (inc.count(), calls.append(("iceberg", out))),
    )
    run_incremental(spark, in_dir, str(tmp_path / "ckpt1"), "edges_rel")
    assert calls and all(kind == "parquet" for kind, _ in calls)
    with pytest.raises(ValueError, match="spark.sql.catalog.nosuchcat"):
        run_incremental(
            spark, in_dir, str(tmp_path / "ckpt2"), "nosuchcat.db.edges"
        )
