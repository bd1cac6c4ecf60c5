"""Resumability (north rule): kill after superstep k, restart, identical
final membership.  Simulated by truncating the checkpoint directory to an
intermediate superstep + rewinding state.json, then resuming."""

import json
import os
import shutil

import numpy as np
import pandas as pd

from leidenalg_spark.operators.checkpoint import CheckpointManager
from leidenalg_spark.operators.leiden import leiden
from leidenalg_spark.sources import fixtures as fx


def _edges(spark, fix):
    n, s, d, w = fix[:4]
    if w is None:
        w = np.ones(len(s))
    return spark.createDataFrame(
        pd.DataFrame({"src": s.astype("int64"), "dst": d.astype("int64"), "weight": w.astype("float64")})
    )


def test_resume_reproduces_uninterrupted_run(spark, tmp_path):
    fix = fx.erdos_renyi(120, 0.06, seed=8)
    e = _edges(spark, fix)
    kw = dict(method="cpm", gamma=0.2, local_threshold=0, n_iterations=1, seed=11, max_supersteps=6)

    full_dir = tmp_path / "full"
    res_full = leiden(spark, e, ckpt=CheckpointManager(spark, str(full_dir)), **kw)
    full = res_full.membership.toPandas().sort_values("id").reset_index(drop=True)

    # "crash" after superstep 2: copy the full run's artifacts, drop
    # everything newer, rewind state.json
    crash_dir = tmp_path / "crash"
    shutil.copytree(full_dir, crash_dir)
    memb_dir = crash_dir / "membership"
    kept = 2
    for d in os.listdir(memb_dir):
        if int(d.split("=")[1]) > kept:
            shutil.rmtree(memb_dir / d)
    with open(crash_dir / "state.json", "w") as f:
        json.dump({"iteration": 0, "step": kept, "ckpt_idx": kept, "total_steps": 0}, f)

    res_resumed = leiden(spark, e, ckpt=CheckpointManager(spark, str(crash_dir)), resume=True, **kw)
    resumed = res_resumed.membership.toPandas().sort_values("id").reset_index(drop=True)

    assert (full["comm"].to_numpy() == resumed["comm"].to_numpy()).all()
    assert np.isclose(res_full.quality, res_resumed.quality, rtol=1e-9)


def test_metrics_history_survives_resume(spark, tmp_path):
    """Regression: a resumed manager must carry the pre-crash metrics
    stream — object-store roots rewrite metrics.jsonl from the in-memory
    lines, which used to start empty on resume and wipe the history."""
    root = str(tmp_path / "ckpt")
    m1 = CheckpointManager(spark, root)
    m1.log(name="superstep", step=0)
    m1.log(name="superstep", step=1)
    m2 = CheckpointManager(spark, root)  # the "resumed" manager
    assert len(m2._metric_lines) == 2    # history seeded from disk
    m2.log(name="superstep", step=2)
    with open(os.path.join(root, "metrics.jsonl")) as f:
        lines = [json.loads(ln) for ln in f.read().strip().splitlines()]
    assert [r["step"] for r in lines] == [0, 1, 2]


def test_ephemeral_close_releases_tmpdir(spark):
    m = CheckpointManager(spark)
    root = m._tmp_root
    assert os.path.isdir(root)
    m.close()
    assert not os.path.exists(root)
    m.close()  # idempotent
