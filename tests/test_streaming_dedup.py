"""Streaming exact dedup vs the batch twin: first-occurrence-wins over
two micro-batch runs must equal a deterministic batch computation on the
same input, and within one run must match dedup_exact's keepers."""

from pyspark.sql import functions as F

from leidenalg_spark.operators.dedup import dedup_exact
from leidenalg_spark.streaming.dedup import run_streaming_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_streaming_dedup_single_run_matches_batch(spark, tmp_path):
    rows = [
        (1, "alpha beta"),
        (2, "ALPHA   beta"),  # dup of 1 after normalisation
        (3, "gamma"),
        (4, "delta"),
        (5, "gamma "),  # dup of 3
    ]
    in_dir = str(tmp_path / "in")
    _docs(spark, rows).write.parquet(in_dir)
    run_streaming_dedup(
        spark, in_dir, str(tmp_path / "ckpt"), str(tmp_path / "out"), str(tmp_path / "state")
    )
    got = {
        (r["doc_id"], r["fingerprint"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    exp = {
        (r["doc_id"], r["fingerprint"])
        for r in dedup_exact(spark.read.parquet(in_dir)).where("is_kept").collect()
    }
    assert got == exp
    assert len(got) == 3


def test_streaming_dedup_second_run_first_wins(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    _docs(spark, [(10, "one"), (11, "two")]).write.mode("append").parquet(in_dir)
    run_streaming_dedup(spark, in_dir, ckpt, out, state)

    # second drop: doc 5 duplicates "one" (id SMALLER than the original
    # keeper) and doc 12 is new — only 12 may be emitted, and 10 stays
    # the keeper because it arrived first
    _docs(spark, [(5, "one"), (12, "three")]).write.mode("append").parquet(in_dir)
    run_streaming_dedup(spark, in_dir, ckpt, out, state)

    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {10, 11, 12}
    # state holds exactly the three distinct fingerprints
    st = spark.read.parquet(state)
    assert st.select("fingerprint").distinct().count() == 3


def test_streaming_dedup_within_batch_min_doc_id(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    _docs(spark, [(9, "same text"), (3, "same  TEXT"), (7, "same text")]).write.parquet(in_dir)
    run_streaming_dedup(
        spark, in_dir, str(tmp_path / "ckpt"), str(tmp_path / "out"), str(tmp_path / "state")
    )
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    assert [r["doc_id"] for r in rows] == [3]
