"""Table-ref I/O (Iceberg-or-parquet) + spark-submit entry packaging."""

import json
import os
import subprocess
import sys

import pytest

from leidenalg_spark.sources.tables import (
    TRANSCRIPT_SCHEMA,
    is_table_ref,
    iceberg_available,
    read_table,
    read_transcripts,
    write_table,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_table_ref_detection():
    assert is_table_ref("catalog.db.transcripts")
    assert is_table_ref("transcripts")
    assert not is_table_ref("/data/transcripts")
    assert not is_table_ref("s3://bucket/x")  # scheme paths contain '/'


def test_iceberg_not_available_without_catalog(spark):
    assert not iceberg_available(spark, "nosuch.db.t")
    assert not iceberg_available(spark, "/plain/path")


def test_parquet_roundtrip_modes(spark, tmp_path):
    from leidenalg_spark.sources.transcripts import synthetic_transcripts

    t = synthetic_transcripts(spark, n_convs=20, seed=7)
    ref = str(tmp_path / "t")
    write_table(t, ref, mode="overwrite")
    back = read_transcripts(spark, ref)
    assert back.count() == t.count()
    assert set(back.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    # append doubles the rows
    write_table(t, ref, mode="append")
    assert read_table(spark, ref).count() == 2 * t.count()
    # dynamic partition overwrite degrades to plain overwrite on parquet
    write_table(t, ref, mode="overwrite_partitions")
    assert read_table(spark, ref, schema=TRANSCRIPT_SCHEMA).count() == t.count()


def test_read_transcripts_rejects_wrong_schema(spark, tmp_path):
    ref = str(tmp_path / "bad")
    spark.range(5).write.parquet(ref)
    with pytest.raises(ValueError, match="missing columns"):
        read_transcripts(spark, ref)


def test_package_pyfiles_zip():
    out = subprocess.run(
        ["sh", os.path.join(REPO, "scripts", "package_pyfiles.sh")],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    assert os.path.exists(os.path.join(REPO, "dist", "leidenalg_spark.zip"))
    import zipfile

    names = zipfile.ZipFile(os.path.join(REPO, "dist", "leidenalg_spark.zip")).namelist()
    assert "leidenalg_spark/__init__.py" in names
    assert "leidenalg_spark/operators/leiden.py" in names


def test_submit_entry_local_smoke(tmp_path):
    """scripts/submit_leiden.py end-to-end in a fresh interpreter (the
    spark-submit driver path), synthetic input, checkpointed, resumable."""
    ck = str(tmp_path / "ck")
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "submit_leiden.py"),
        "--synthetic", "120", "--method", "cpm", "--gamma", "0.5",
        "--checkpoint", ck, "--seed", "3",
    ]
    env = dict(os.environ, PYTHONPATH=REPO)
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, env=env, timeout=600)
    assert p.returncode == 0, p.stderr[-2000:]
    rec = json.loads(p.stdout.strip().splitlines()[-1])
    assert rec["method"] == "cpm" and rec["communities"] > 0
    assert os.path.exists(os.path.join(ck, "final"))


def test_write_table_ref_without_catalog_raises(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"x": [1]}))
    with pytest.raises(ValueError, match="no configured Spark catalog"):
        write_table(df, "nosuch.db.t", mode="overwrite")


def test_checkpoint_hadoop_fs_branch(spark, tmp_path):
    """The Hadoop FileSystem checkpoint path (s3a/hdfs roots) exercised
    against file:/ URIs — same code path, locally-testable filesystem."""
    from leidenalg_spark.operators.checkpoint import CheckpointManager, _HadoopFS, _is_remote

    assert _is_remote("s3a://bucket/run") and _is_remote("hdfs://nn/x")
    assert not _is_remote(str(tmp_path)) and not _is_remote(None)

    root = str(tmp_path / "hckpt")
    ckpt = CheckpointManager(spark, root)
    ckpt.fs = _HadoopFS(spark, "file:" + root)  # force the Hadoop branch
    df = spark.range(10).selectExpr("id", "id % 3 AS comm")
    out = ckpt.save(df, "membership", 0)
    assert out.count() == 10
    assert ckpt.latest_step("membership") == 0
    ckpt.save_state({"iteration": 1, "step": 2})
    assert ckpt.load_state() == {"iteration": 1, "step": 2}
    ckpt.log(name="x", step=1)
    back = ckpt.load("membership", 0)
    assert back.count() == 10
