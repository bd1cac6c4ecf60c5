"""Streaming MinHash near-dup admission vs the batch greedy twin:
multi-batch runs with ascending ids must admit exactly the single-batch
greedy set, and the greedy semantics (chain A–B–C admits A and C) must
differ from the transitive collapse where designed to."""

from leidenalg_spark.operators.dedup import online_neardup_filter
from leidenalg_spark.streaming.neardup import run_streaming_neardup

BASE = "the quick brown fox jumps over the lazy dog again and again today"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _variant(i):
    # near-dups of BASE: one token appended — high shingle overlap
    return BASE + f" v{i}"


ROWS1 = [
    (1, BASE),
    (2, BASE + " tail"),          # near-dup of 1
    (3, "completely different content about spark dataframes and shuffles"),
]
ROWS2 = [
    (11, BASE + "  tail"),        # still a near-dup of the id-1 family
    (12, "another unrelated corpus row with fresh vocabulary entirely"),
]


def test_batch_greedy_flags(spark):
    flags = {
        r["doc_id"]: r["admitted"]
        for r in online_neardup_filter(_docs(spark, ROWS1)).collect()
    }
    assert flags[1] and flags[3]
    assert not flags[2]  # collides with admitted 1


def test_streaming_matches_single_batch_greedy(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    # two drops with ascending ids
    _docs(spark, ROWS1).write.mode("append").parquet(in_dir)
    run_streaming_neardup(
        spark, in_dir, str(tmp_path / "ckpt"), out, str(tmp_path / "state")
    )
    _docs(spark, ROWS2).write.mode("append").parquet(in_dir)
    run_streaming_neardup(
        spark, in_dir, str(tmp_path / "ckpt"), out, str(tmp_path / "state")
    )
    got = {
        r["doc_id"]: r["admitted"] for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: r["admitted"]
        for r in online_neardup_filter(_docs(spark, ROWS1 + ROWS2)).collect()
    }
    assert got == want
    assert got[1] and got[3] and got[12]
    assert not got[2] and not got[11]  # 11 blocked by the id-1 history


def test_replay_is_idempotent(spark, tmp_path):
    import shutil

    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    _docs(spark, ROWS1).write.mode("append").parquet(in_dir)
    run_streaming_neardup(
        spark, in_dir, str(tmp_path / "ckpt"), out, str(tmp_path / "state")
    )
    before = sorted(
        (r["doc_id"], r["admitted"]) for r in spark.read.parquet(out).collect()
    )
    # losing the streaming checkpoint replays batch 0 at-least-once;
    # first_batch filtering makes the replay recompute identically
    shutil.rmtree(str(tmp_path / "ckpt"))
    run_streaming_neardup(
        spark, in_dir, str(tmp_path / "ckpt2"), out, str(tmp_path / "state")
    )
    after = sorted(
        (r["doc_id"], r["admitted"]) for r in spark.read.parquet(out).collect()
    )
    assert after == before


def test_shingleless_docs_vacuously_admitted(spark):
    flags = {
        r["doc_id"]: r["admitted"]
        for r in online_neardup_filter(
            _docs(spark, [(1, ""), (2, "   "), (3, BASE), (4, BASE + " x")])
        ).collect()
    }
    assert flags[1] and flags[2]  # nothing to collide with
    assert flags[3] and not flags[4]
