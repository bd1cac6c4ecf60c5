"""Parallel test runner (pytest-xdist is not available in this
environment and installs are barred, so shard at the FILE level across
subprocesses instead — each worker gets its own JVM/SparkSession, which
is exactly the grouping xdist's --dist loadfile would give).

Usage: python scripts/run_tests_parallel.py [n_workers] [pytest args...]

Files are greedy-bin-packed by a cost table (measured single-process
runtimes, falling back to file size) so the longest shard, not the file
count, bounds wall time.  Exit code is non-zero if any shard fails.

Measured (round 4, local box, 32 cores): 4 workers → 991 s wall for the
full ~1000-test suite (longest shard 880 s) vs ~2310 s single-process;
use 5-6 workers to land under 15 minutes.
"""
from __future__ import annotations

import glob
import os
import subprocess
import sys
import tempfile
import time

# measured single-process seconds (r3 judge run); anything absent falls
# back to size-proportional cost
COST = {
    "test_leiden_round2.py": 420,
    "test_leiden_round4.py": 420,
    "test_leiden_spark.py": 300,
    "test_leiden_round3.py": 260,
    "test_oracle_parity.py": 420,
    "test_planted_recovery.py": 200,
    "test_resume.py": 200,
    "test_multiplex_profile.py": 180,
    "test_streaming.py": 150,
    "test_round2c_ops.py": 150,
    "test_round2b_ops.py": 150,
    "test_training_ops.py": 120,
    "test_biconnected.py": 120,
    "test_edges_and_kernels.py": 240,
    "test_streaming_stateful.py": 90,
}


def main() -> int:
    args = sys.argv[1:]
    n = 4
    if args and args[0].isdigit():
        n = int(args[0])
        args = args[1:]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(glob.glob(os.path.join(root, "tests", "test_*.py")))
    costed = sorted(
        files,
        key=lambda f: -COST.get(os.path.basename(f), os.path.getsize(f) / 2000),
    )
    shards: list[list[str]] = [[] for _ in range(n)]
    loads = [0.0] * n
    for f in costed:
        i = loads.index(min(loads))
        shards[i].append(f)
        loads[i] += COST.get(os.path.basename(f), os.path.getsize(f) / 2000)

    t0 = time.time()
    procs = []
    for i, shard in enumerate(shards):
        if not shard:
            continue
        env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "4"))
        # each shard streams to its own temp file — a PIPE drained
        # sequentially would let a verbose shard block on a full 64 KB
        # pipe buffer while an earlier shard is still being waited on
        log = tempfile.NamedTemporaryFile(
            mode="w+", suffix=f"_shard{i}.log", delete=False
        )
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", "-q", *args, *shard],
            cwd=root, env=env, stdout=log, stderr=subprocess.STDOUT, text=True,
        )
        procs.append((i, p, log))
    rc = 0
    for i, p, log in procs:
        p.wait()
        log.seek(0)
        tail = "\n".join(log.read().strip().splitlines()[-3:])
        log.close()
        os.unlink(log.name)
        print(f"--- shard {i} (rc={p.returncode}) ---\n{tail}", flush=True)
        if p.returncode not in (0, 5):  # 5 = no tests collected
            rc = 1
    print(f"total wall: {time.time() - t0:.0f}s, rc={rc}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
