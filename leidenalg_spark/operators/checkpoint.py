"""Per-superstep checkpointing with lineage + metrics (north rule).

Iterative DataFrame jobs grow their logical plans without bound; every
superstep therefore materialises its state table.  Two modes:

- durable (``path`` given): state written as parquet under
  ``{path}/{name}/step={k}``, metrics appended to ``{path}/metrics.jsonl``
  — a run can resume from the latest complete step after a crash
  (resumability test: kill after superstep k, restart, identical result).
- ephemeral: ``localCheckpoint`` — truncates lineage only.

The parquet round-trip also acts as the lineage barrier, so checkpointing
costs nothing extra beyond the write (SURVEY.md §7.3 item 6).
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class CheckpointManager:
    def __init__(self, spark: SparkSession, path: str | None = None, run_id: str = "run"):
        self.spark = spark
        self.path = path
        self.run_id = run_id
        self.metrics: list[dict] = []
        if path:
            os.makedirs(path, exist_ok=True)

    # ------------------------------------------------------------------
    def save(self, df: DataFrame, name: str, step: int, **metric_kv) -> DataFrame:
        """Materialise a superstep state table; returns the barrier'd DF."""
        t0 = time.time()
        if self.path:
            target = os.path.join(self.path, name, f"step={step:05d}")
            tmp = target + ".tmp"
            df.write.mode("overwrite").parquet(tmp)
            if os.path.exists(target):
                shutil.rmtree(target)
            os.replace(tmp, target)
            out = self.spark.read.parquet(target)
        else:
            out = df.localCheckpoint(eager=True)
        self.log(name=name, step=step, checkpoint_secs=round(time.time() - t0, 4), **metric_kv)
        return out

    def log(self, **kv):
        rec = {"run_id": self.run_id, "ts": time.time(), **kv}
        self.metrics.append(rec)
        if self.path:
            with open(os.path.join(self.path, "metrics.jsonl"), "a") as f:
                f.write(json.dumps(rec) + "\n")

    # ------------------------------------------------------------------
    def save_state(self, state: dict) -> None:
        """Atomic driver-loop state (iteration/step/phase) for resume."""
        if not self.path:
            return
        tmp = os.path.join(self.path, "state.json.tmp")
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, os.path.join(self.path, "state.json"))

    def load_state(self) -> dict | None:
        if not self.path:
            return None
        p = os.path.join(self.path, "state.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    # ------------------------------------------------------------------
    def latest_step(self, name: str) -> int | None:
        """Largest complete step on disk, for resume-from-checkpoint."""
        if not self.path:
            return None
        d = os.path.join(self.path, name)
        if not os.path.isdir(d):
            return None
        steps = sorted(
            int(s.split("=")[1])
            for s in os.listdir(d)
            if s.startswith("step=") and not s.endswith(".tmp")
        )
        return steps[-1] if steps else None

    def load(self, name: str, step: int) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, name, f"step={step:05d}"))
