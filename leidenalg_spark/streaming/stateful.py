"""Custom stateful streaming operator: conversation sessionization.

The reference is batch-only (SURVEY.md §2.6) and has no notion of a
"session"; at 10^12-turn scale, however, the transcript stream is the
primary input (input schema: conv_id, turn_idx, role, text, tool, ts)
and the natural unit of incremental graph maintenance is the *closed
conversation session* — a maximal run of turns with no gap larger than
``gap``.  Downstream, each closed session is one unit of edge derivation
(streaming/incremental.py) and one unit of re-clustering.

Implemented as ``applyInPandasWithState`` — Spark's arbitrary-stateful
operator with Arrow-batched per-group pandas (no per-row Python in the
hot path; one vectorised gap-split per group per micro-batch):

- grouped by ``conv_id``: all of a conversation's turns land on one
  task; state is a fixed-width tuple (start, last, turns, tools,
  next session ordinal) — O(#open conversations) total state, bounded
  because conversations are temporally local and the event-time timeout
  reaps idle ones.
- sessions that close *inside* a micro-batch (a gap between two arrived
  turns) emit immediately; the session left open at the batch edge waits
  in state and is emitted by the **event-time timeout** once the
  watermark passes ``last_ts + gap`` — exactly-once per session, late
  turns within the watermark still extend their session.

Scale notes: state rows are ~40 bytes; the shuffle is one hash exchange
of the micro-batch keyed by conv_id (the same key the transcript table
is clustered by, so a co-partitioned source skips it); no skew — a
conversation is one group, and group size is bounded by turns-per-batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "conv_id string, session_ord int, session_start timestamp, "
    "session_end timestamp, n_turns int, n_tool_calls int"
)
# the stateful operator itself emits raw epoch seconds: pandas receives
# *session-local naive* timestamps from Spark, so any Python-side
# epoch arithmetic would silently assume UTC and both the event-time
# timeout and the output timestamps would shift by the session-timezone
# offset.  Instead the epoch is computed JVM-side (cast timestamp ->
# double, timezone-correct) on the way in and converted back JVM-side
# (timestamp_seconds) on the way out — no Python timezone handling at all.
_OUT_SCHEMA = (
    "conv_id string, session_ord int, session_start double, "
    "session_end double, n_turns int, n_tool_calls int"
)
_STATE_SCHEMA = "start double, last double, turns int, tools int, next_ord int"

_UNITS = {
    "second": 1.0, "seconds": 1.0, "minute": 60.0, "minutes": 60.0,
    "hour": 3600.0, "hours": 3600.0, "day": 86400.0, "days": 86400.0,
}


def _secs(interval: str) -> float:
    value, unit = interval.split()
    return float(value) * _UNITS[unit]




def _session_fn(gap_s: float):
    """Per-conversation state machine (runs once per group per batch)."""

    def fn(key, pdf_iter, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            # watermark passed last+gap with no new turns: close the
            # open session and drop the state row
            start, last, turns, tools, next_ord = state.get
            state.remove()
            yield pd.DataFrame({
                "conv_id": [conv_id], "session_ord": [next_ord],
                "session_start": [float(start)],
                "session_end": [float(last)],
                "n_turns": [turns], "n_tool_calls": [tools],
            })
            return

        chunks = [c for c in pdf_iter if len(c)]
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values("ts_epoch", kind="stable")
        ts = pdf["ts_epoch"].to_numpy(dtype="float64")
        tool = pdf["tool"].notna().to_numpy()

        if state.exists:
            start, last, turns, tools, next_ord = state.get
        else:
            start, last, turns, tools, next_ord = ts[0], ts[0] - gap_s * 2, 0, 0, 0

        out = {k: [] for k in
               ("conv_id", "session_ord", "session_start", "session_end",
                "n_turns", "n_tool_calls")}
        # vectorised split points: a turn starts a new session iff its gap
        # to the LATEST previously-seen timestamp exceeds the threshold.
        # The baseline is the prefix max (ts is sorted, so max(state last,
        # previous element)) — a plain shift would let a late cross-batch
        # turn (within the watermark, older than the state's last) fake a
        # gap and split a session that already extends past it
        prev = np.maximum(pd.Series(ts).shift(1, fill_value=last).to_numpy(), last)
        new_sess = (ts - prev) > gap_s
        for i in range(len(ts)):
            if new_sess[i]:
                if turns > 0:
                    out["conv_id"].append(conv_id)
                    out["session_ord"].append(next_ord)
                    out["session_start"].append(float(start))
                    out["session_end"].append(float(last))
                    out["n_turns"].append(turns)
                    out["n_tool_calls"].append(tools)
                    next_ord += 1
                start, last, turns, tools = ts[i], ts[i], 0, 0
            else:
                # late turns extend counts but never move the session end
                # (or the event-time timeout) backward; a late turn older
                # than the recorded start may still move the start back
                last = max(last, ts[i])
                start = min(start, ts[i])
            turns += 1
            tools += int(tool[i])
        state.update((float(start), float(last), int(turns), int(tools), int(next_ord)))
        # never set a timeout at or below the current watermark — Spark
        # rejects it; clamping only triggers when the session is already
        # due, and the +1ms timeout fires it on the next batch
        timeout = int(last * 1000) + int(gap_s * 1000)
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(timeout, wm + 1))
        if out["conv_id"]:
            yield pd.DataFrame(out)

    return fn


def conversation_sessions(
    transcripts: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Closed conversation sessions from a streaming transcript source.

    One row per (conv_id, session_ord) with start/end timestamps, turn
    count and tool-call count; a session closes when the conversation is
    idle for longer than ``gap`` (in-batch) or when the event-time
    watermark passes its last turn plus ``gap`` (timeout).
    """
    t = transcripts.withWatermark("ts", watermark).select(
        "conv_id", "ts", F.col("ts").cast("double").alias("ts_epoch"), "tool"
    )
    raw = t.groupBy("conv_id").applyInPandasWithState(
        _session_fn(_secs(gap)),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return raw.select(
        "conv_id", "session_ord",
        F.timestamp_seconds("session_start").alias("session_start"),
        F.timestamp_seconds("session_end").alias("session_end"),
        "n_turns", "n_tool_calls",
    )


def run_sessionization(
    spark, in_path: str, checkpoint: str, out_path: str,
    gap: str = "30 minutes", watermark: str = "2 hours",
) -> None:
    """Drain everything currently in ``in_path`` into the accumulated
    session table at ``out_path`` (availableNow trigger), resumable via
    the streaming checkpoint."""
    from .incremental import read_transcript_stream

    stream = read_transcript_stream(spark, in_path)
    q = (
        conversation_sessions(stream, gap=gap, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
