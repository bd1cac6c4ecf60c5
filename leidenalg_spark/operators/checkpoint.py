"""Per-superstep checkpointing with lineage + metrics (north rule).

Iterative DataFrame jobs grow their logical plans without bound; every
superstep therefore materialises its state table.  Two modes:

- durable (``path`` given): state written as parquet under
  ``{path}/{name}/step={k}``, metrics appended to ``{path}/metrics.jsonl``
  — a run can resume from the latest complete step after a crash
  (resumability test: kill after superstep k, restart, identical result).
- ephemeral (no ``path``): ``localCheckpoint(eager=True)`` with
  retention-3 block release.  The round-2 parquet-on-tmpfs ephemeral mode
  feared localCheckpoint's storage pinning, but the pin IS releasable:
  the checkpointed RDD appears in ``JavaSparkContext.getPersistentRDDs``
  and ``unpersist`` frees its blocks (verified: blocks drop out of the
  block manager; re-reading the retired step then fails with
  CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND — exactly the contract step-pruned
  parquet had when it deleted old step directories).  So each ``save``
  checkpoints in-memory and unpersists steps older than ``step-2`` for
  that name; live storage is bounded by 3 steps/name regardless of run
  length, and the fixed per-round cost drops from a 32-file parquet
  write+list+re-read (~1.3 s/round — the r2 3× regression on
  connected_components/pagerank) to one block-manager materialisation
  (~50 ms).  Observations riding the saved DataFrame still fire — the
  eager checkpoint executes the observed plan as a normal SQL action.
  A state whose materialised size exceeds ``LEIDEN_CKPT_LOCAL_MAX_BYTES``
  (default 8 GiB) flips that name to the parquet path for its remaining
  steps: giant states spill to tmpfs files instead of competing with
  shuffle/cache memory.  (Retention 3 > the maximum age of any
  still-referenced step: the monotone guard's ``good_membership`` is at
  most one step old.)  Ephemeral mode is single-job convenience — a lost
  executor loses its checkpoint blocks; production runs pass ``path``.

The parquet round-trip also acts as the lineage barrier, so checkpointing
costs nothing extra beyond the write (SURVEY.md §7.3 item 6).

Filesystem access is scheme-aware: a local root uses plain ``os`` calls;
a remote root (``s3a://``, ``hdfs://``, ``gs://``, …) routes every
metadata operation through the Hadoop FileSystem API of the session's
JVM, so ``--checkpoint s3a://bucket/run`` works from any deploy mode —
the round-1 implementation's driver-local ``os.replace`` would look for
the S3 key on the driver's disk and fail.  On object stores the
step-directory rename is a server-side copy; production jobs that need
atomic commits at scale should checkpoint to an Iceberg table
(sources/tables.py) instead, which commits via metadata swap.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _is_remote(path: str | None) -> bool:
    if not path:
        return False
    return urlparse(path).scheme not in ("", "file")


class _LocalFS:
    """Driver-local filesystem ops (fast path for file:// roots)."""

    def makedirs(self, p):
        os.makedirs(p, exist_ok=True)

    def exists(self, p):
        return os.path.exists(p)

    def replace_dir(self, src, dst):
        if os.path.exists(dst):
            shutil.rmtree(dst)
        os.replace(src, dst)

    def listdir(self, p):
        return os.listdir(p) if os.path.isdir(p) else []

    def write_text_atomic(self, p, text):
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
        os.replace(tmp, p)

    def read_text(self, p):
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return f.read()

    def append_line(self, p, line, _all_lines):
        with open(p, "a") as f:
            f.write(line + "\n")


class _HadoopFS:
    """Hadoop FileSystem ops via the session JVM (s3a/hdfs/gs/abfs roots).

    Public Hadoop API only — the same FileSystem instance Spark itself
    uses for the root's scheme, resolved from the session's Hadoop conf
    (credentials, endpoints, committers all inherited).
    """

    def __init__(self, spark: SparkSession, root: str):
        sc = spark.sparkContext
        self._jvm = sc._jvm
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(root).getFileSystem(sc._jsc.hadoopConfiguration())

    def makedirs(self, p):
        self._fs.mkdirs(self._Path(p))

    def exists(self, p):
        return bool(self._fs.exists(self._Path(p)))

    def replace_dir(self, src, dst):
        if self._fs.exists(self._Path(dst)):
            self._fs.delete(self._Path(dst), True)
        self._fs.rename(self._Path(src), self._Path(dst))

    def listdir(self, p):
        if not self.exists(p):
            return []
        return [s.getPath().getName() for s in self._fs.listStatus(self._Path(p))]

    def write_text_atomic(self, p, text):
        # object-store PUT is atomic per object; no tmp+rename needed
        out = self._fs.create(self._Path(p), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()

    def read_text(self, p):
        if not self.exists(p):
            return None
        # py4j cannot fill a Python-side buffer in place; commons-io (a
        # Hadoop dependency) drains the stream JVM-side in one call
        stream = self._fs.open(self._Path(p))
        try:
            return str(self._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8"))
        finally:
            stream.close()

    def append_line(self, p, line, all_lines):
        # object stores have no append — rewrite the (small) metrics file
        # from the in-memory stream
        self.write_text_atomic(p, "\n".join(all_lines) + "\n")


class CheckpointManager:
    def __init__(self, spark: SparkSession, path: str | None = None, run_id: str = "run"):
        self.spark = spark
        self.path = path
        self.run_id = run_id
        self.metrics: list[dict] = []
        self._metric_lines: list[str] = []
        self._tmp_root = None
        if path:
            self.fs = _HadoopFS(spark, path) if _is_remote(path) else _LocalFS()
            self.fs.makedirs(path)
            # a resumed run must carry the pre-crash metrics history:
            # object-store appends rewrite the whole (small) file from
            # _metric_lines, so seed it from what is already durable
            existing = self.fs.read_text(self._join("metrics.jsonl"))
            if existing:
                self._metric_lines = existing.strip("\n").split("\n")
        else:
            import atexit
            import tempfile

            base = "/dev/shm" if os.path.isdir("/dev/shm") else None
            self._tmp_root = tempfile.mkdtemp(prefix="leiden-ckpt-", dir=base)
            # cleanup at PROCESS exit, not GC: the caller's result
            # DataFrame still reads the final step's parquet after the
            # manager itself goes out of scope — close() releases earlier
            # when the caller has barrier'd its result
            self._cleanup = lambda p=self._tmp_root: shutil.rmtree(p, ignore_errors=True)
            atexit.register(self._cleanup)
            self.fs = None
            # per-name history of localCheckpoint'd steps:
            # name -> list[(step, [persistent_rdd_ids])]
            self._lc_steps: dict[str, list] = {}
            self._parquet_names: set[str] = set()
            self._lc_max_bytes = int(
                os.environ.get("LEIDEN_CKPT_LOCAL_MAX_BYTES", 8 * 1024**3)
            )

    # -------------------------------------------------- ephemeral helpers
    def _persistent_ids(self) -> set[int]:
        jmap = self.spark.sparkContext._jsc.getPersistentRDDs()
        return {int(i) for i in jmap.keySet().toArray()}

    def _unpersist_ids(self, ids) -> None:
        jmap = self.spark.sparkContext._jsc.getPersistentRDDs()
        for i in ids:
            rdd = jmap.get(i)
            if rdd is not None:
                rdd.unpersist(False)

    def _retire_lc(self, name: str, keep_from_step: int) -> None:
        hist = self._lc_steps.get(name, [])
        keep = []
        for step, ids in hist:
            if step < keep_from_step:
                self._unpersist_ids(ids)
            else:
                keep.append((step, ids))
        self._lc_steps[name] = keep

    def _lc_bytes(self, ids) -> int:
        total = 0
        for info in self.spark.sparkContext._jsc.sc().getRDDStorageInfo():
            if int(info.id()) in ids:
                total += int(info.memSize()) + int(info.diskSize())
        return total

    def _cap_stats(self, out: DataFrame) -> DataFrame:
        """Bound the size statistic a localCheckpoint carries forward.

        ``Dataset.localCheckpoint`` propagates the origin plan's
        estimated ``sizeInBytes`` into the resulting LogicalRDD.  In an
        iterative kernel the next superstep's plan JOINS the checkpointed
        state several times, and Catalyst's size-only estimator
        MULTIPLIES child sizes through every join — so the carried
        statistic is raised to a power per superstep, its DIGIT COUNT
        grows geometrically (measured ×3/superstep in the multiplex
        loop), and by step ~15 the driver melts down doing Toom-Cook
        BigInt multiplication inside stats estimation (the parquet
        ephemeral mode never hit this because re-reading files derives
        fresh stats from file size).  Once the estimate exceeds
        Long.MaxValue it is meaningless for planning anyway, so past
        2^62 we rewrap the SAME checkpointed internal RDD via
        ``internalCreateDataFrame`` — no recompute, no extra blocks —
        whose LogicalRDD carries no origin stats (leaf falls back to
        ``defaultSizeInBytes``); explicit broadcast/merge hints and AQE's
        runtime sizes drive the join strategy from there."""
        exploded = True
        try:
            # py4j converts the scala BigInt to a Python int; a ValueError
            # (the CPython 4300-digit str-conversion guard) IS the signal
            # the estimate exploded
            sz = out._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            exploded = int(sz) > (1 << 62)
        except ValueError:
            exploded = True
        except Exception:
            return out  # stats API drift: cap is an optimisation only
        if not exploded:
            return out
        try:
            jdf = self.spark._jsparkSession.internalCreateDataFrame(
                out._jdf.queryExecution().toRdd(), out._jdf.schema(), False
            )
            return DataFrame(jdf, self.spark)
        except Exception:
            # private-API drift tolerance: the cap is a planner-cost
            # optimisation, never a correctness requirement
            return out

    def close(self) -> None:
        """Release an ephemeral manager's storage (checkpoint blocks +
        tmpdir) now instead of at process exit.  Only valid once every
        DataFrame returned by :meth:`save` has been barrier'd past this
        manager's storage (e.g. its own ``localCheckpoint``) — the
        iterative operators do exactly that before closing."""
        if self._tmp_root is not None:
            import atexit

            for hist in self._lc_steps.values():
                for _step, ids in hist:
                    self._unpersist_ids(ids)
            self._lc_steps.clear()
            self._cleanup()
            try:
                atexit.unregister(self._cleanup)
            except Exception:
                pass
            self._tmp_root = None

    def _join(self, *parts) -> str:
        return "/".join([self.path.rstrip("/"), *parts])

    # ------------------------------------------------------------------
    def save(self, df: DataFrame, name: str, step: int, **metric_kv) -> DataFrame:
        """Materialise a superstep state table; returns the barrier'd DF."""
        t0 = time.time()
        if self.path:
            target = self._join(name, f"step={step:05d}")
            tmp = target + ".tmp"
            df.write.mode("overwrite").parquet(tmp)
            self.fs.replace_dir(tmp, target)
            out = self.spark.read.parquet(target)
        elif name in self._parquet_names:
            d = os.path.join(self._tmp_root, name)
            target = os.path.join(d, f"step={step:05d}")
            df.write.mode("overwrite").parquet(target)
            out = self.spark.read.parquet(target)
            # retain only steps >= step-2 (see module docstring); numeric
            # comparison, not recency, so a later kernel run restarting at
            # step 0 on the same manager never deletes its own fresh steps
            if os.path.isdir(d):
                for s in os.listdir(d):
                    if s.startswith("step=") and int(s.split("=")[1]) < step - 2:
                        shutil.rmtree(os.path.join(d, s), ignore_errors=True)
            self._retire_lc(name, step - 2)  # earlier lc steps of this name
        else:
            before = self._persistent_ids()
            out = df.localCheckpoint(eager=True)
            out = self._cap_stats(out)
            new_ids = self._persistent_ids() - before
            self._lc_steps.setdefault(name, []).append((step, new_ids))
            self._retire_lc(name, step - 2)
            if new_ids and self._lc_bytes(new_ids) > self._lc_max_bytes:
                # this state is too big to triple-buffer in block storage;
                # remaining steps of this name spill to tmpfs parquet
                self._parquet_names.add(name)
        self.log(name=name, step=step, checkpoint_secs=round(time.time() - t0, 4), **metric_kv)
        return out

    def log(self, **kv):
        rec = {"run_id": self.run_id, "ts": time.time(), **kv}
        self.metrics.append(rec)
        if self.path:
            line = json.dumps(rec)
            self._metric_lines.append(line)
            self.fs.append_line(self._join("metrics.jsonl"), line, self._metric_lines)

    # ------------------------------------------------------------------
    def save_state(self, state: dict) -> None:
        """Atomic driver-loop state (iteration/step/phase) for resume."""
        if not self.path:
            return
        self.fs.write_text_atomic(self._join("state.json"), json.dumps(state))

    def load_state(self) -> dict | None:
        if not self.path:
            return None
        text = self.fs.read_text(self._join("state.json"))
        return json.loads(text) if text else None

    # ------------------------------------------------------------------
    def latest_step(self, name: str) -> int | None:
        """Largest complete step on disk, for resume-from-checkpoint."""
        if not self.path:
            return None
        steps = sorted(
            int(s.split("=")[1])
            for s in self.fs.listdir(self._join(name))
            if s.startswith("step=") and not s.endswith(".tmp")
        )
        return steps[-1] if steps else None

    def load(self, name: str, step: int) -> DataFrame:
        return self.spark.read.parquet(self._join(name, f"step={step:05d}"))
