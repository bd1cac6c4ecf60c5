"""Stateful streaming sessionization (applyInPandasWithState):
in-batch gap splits emit immediately; sessions left open at a batch edge
close via event-time timeout once the watermark passes; results equal a
batch gap-split of the same input."""

import datetime as dt

import pandas as pd

from leidenalg_spark.streaming.stateful import run_sessionization

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


_SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def _write(spark, rows, path):
    spark.createDataFrame(rows, _SCHEMA).write.mode("append").parquet(path)


def test_sessionization_gap_split_and_timeout(spark, tmp_path):
    in_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    s = dt.timedelta(seconds=1)
    rows = [
        # convA: 3 turns, 2h idle, 2 more turns -> two sessions
        ("convA", 0, "user", "x", None, T0),
        ("convA", 1, "assistant", "x", "tool_1", T0 + 10 * s),
        ("convA", 2, "user", "x", None, T0 + 20 * s),
        ("convA", 3, "user", "x", None, T0 + dt.timedelta(hours=2)),
        ("convA", 4, "assistant", "x", "tool_2", T0 + dt.timedelta(hours=2) + 10 * s),
        # convB: one short session
        ("convB", 0, "user", "x", None, T0 + 5 * s),
        ("convB", 1, "assistant", "x", None, T0 + 15 * s),
    ]
    _write(spark, rows, in_dir)
    run_sessionization(spark, in_dir, ckpt, out, gap="30 minutes", watermark="1 hour")

    # sentinel batches: advance the watermark so open sessions time out
    _write(spark, [("zz1", 0, "user", "x", None, T0 + dt.timedelta(days=30))], in_dir)
    run_sessionization(spark, in_dir, ckpt, out, gap="30 minutes", watermark="1 hour")
    _write(spark, [("zz2", 0, "user", "x", None, T0 + dt.timedelta(days=60))], in_dir)
    run_sessionization(spark, in_dir, ckpt, out, gap="30 minutes", watermark="1 hour")

    got = (
        spark.read.parquet(out).toPandas()
        .query("~conv_id.str.startswith('zz')")
        .sort_values(["conv_id", "session_ord"])
        .reset_index(drop=True)
    )
    assert len(got) == 3
    a0, a1, b0 = got.iloc[0], got.iloc[1], got.iloc[2]
    assert (a0.conv_id, a0.session_ord, a0.n_turns, a0.n_tool_calls) == ("convA", 0, 3, 1)
    assert a0.session_start == T0 and a0.session_end == T0 + 20 * s
    assert (a1.conv_id, a1.session_ord, a1.n_turns, a1.n_tool_calls) == ("convA", 1, 2, 1)
    assert a1.session_start == T0 + dt.timedelta(hours=2)
    assert (b0.conv_id, b0.session_ord, b0.n_turns) == ("convB", 0, 2)


def test_sessionization_matches_batch_on_synthetic(spark, tmp_path):
    # synthetic transcripts space turns 10s apart -> exactly one session
    # per conversation; totals must match the batch table
    from leidenalg_spark.sources.transcripts import synthetic_transcripts

    t = synthetic_transcripts(spark, n_convs=30, max_turns=8, seed=11).persist()
    in_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    t.write.parquet(in_dir)
    run_sessionization(spark, in_dir, ckpt, out, gap="30 minutes", watermark="1 hour")
    last = t.agg({"ts": "max"}).first()[0]
    _write(spark, [("zz1", 0, "user", "x", None, last + dt.timedelta(days=30))], in_dir)
    run_sessionization(spark, in_dir, ckpt, out, gap="30 minutes", watermark="1 hour")
    _write(spark, [("zz2", 0, "user", "x", None, last + dt.timedelta(days=60))], in_dir)
    run_sessionization(spark, in_dir, ckpt, out, gap="30 minutes", watermark="1 hour")

    got = spark.read.parquet(out).where("conv_id not like 'zz%'").toPandas()
    # the streaming operator must agree EXACTLY with the batch twin
    from leidenalg_spark.operators.sessions import sessionize

    exp = sessionize(
        t, key="conv_id", ts_col="ts", gap_s=1800.0, tool_col="tool",
        tiebreak="turn_idx",
    ).toPandas()
    key = ["conv_id", "session_ord"]
    g = got.sort_values(key).reset_index(drop=True)
    e = exp.sort_values(key).reset_index(drop=True)
    assert len(g) == len(e) == 30  # one session per conversation (10s spacing)
    m = g.merge(e, on=key, suffixes=("_s", "_b"))
    assert len(m) == len(e)
    assert (m["n_turns"] == m["n_events"]).all()
    assert (m["n_tool_calls_s"] == m["n_tool_calls_b"]).all()
    assert (m["session_start_s"] == m["session_start_b"]).all()
    assert (m["session_end_s"] == m["session_end_b"]).all()
    t.unpersist()


def test_sessionization_late_turn_does_not_regress_session(spark, tmp_path):
    """Regression: a late (within-watermark, cross-batch) turn older than
    the state's last timestamp used to move the session end and event-time
    timeout BACKWARD and could fake a gap split.  It must only extend the
    turn count (and possibly move the start back)."""
    in_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    s = dt.timedelta(seconds=1)
    # batch 1: two turns, last at T0+20m
    _write(spark, [
        ("convL", 0, "user", "x", None, T0),
        ("convL", 2, "user", "x", None, T0 + dt.timedelta(minutes=20)),
    ], in_dir)
    run_sessionization(spark, in_dir, ckpt, out, gap="30 minutes", watermark="2 hours")
    # batch 2: a LATE turn at T0+10m (older than last, within watermark)
    _write(spark, [("convL", 1, "assistant", "x", "tool_9", T0 + dt.timedelta(minutes=10))], in_dir)
    run_sessionization(spark, in_dir, ckpt, out, gap="30 minutes", watermark="2 hours")
    # sentinels: push the watermark far ahead so the session times out
    _write(spark, [("zz1", 0, "user", "x", None, T0 + dt.timedelta(days=30))], in_dir)
    run_sessionization(spark, in_dir, ckpt, out, gap="30 minutes", watermark="2 hours")
    _write(spark, [("zz2", 0, "user", "x", None, T0 + dt.timedelta(days=60))], in_dir)
    run_sessionization(spark, in_dir, ckpt, out, gap="30 minutes", watermark="2 hours")

    got = (
        spark.read.parquet(out).toPandas()
        .query("conv_id == 'convL'")
        .sort_values("session_ord").reset_index(drop=True)
    )
    assert len(got) == 1  # no fake split from the late turn
    row = got.iloc[0]
    assert row.n_turns == 3 and row.n_tool_calls == 1
    assert row.session_start == T0
    assert row.session_end == T0 + dt.timedelta(minutes=20)  # end did not regress
