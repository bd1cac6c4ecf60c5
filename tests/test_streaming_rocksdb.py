"""RocksDB-backed streaming state (VERDICT r3 item 8): the stateful
operators — applyInPandasWithState sessionization and the stream-stream
interval-join attribution — run on
``RocksDBStateStoreProvider`` with identical results to the default
HDFS-backed provider, and the checkpoint actually contains RocksDB
artifacts (not heap-snapshot .delta files).  At the 10^12-turn horizon
the watermark-bounded state must live off-heap; this pins the config
path (`streaming/statestore.py`) end to end.
"""

import datetime as dt
import os

import pytest

from leidenalg_spark.streaming.statestore import (
    ROCKSDB_PROVIDER,
    rocksdb_conf,
    use_rocksdb_state_store,
)

_SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
T0 = dt.datetime(2026, 1, 1, 0, 0, 0)
_CONF = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture()
def rocksdb(spark):
    prev = {k: spark.conf.get(k, None) for k in rocksdb_conf()}
    use_rocksdb_state_store(spark)
    assert spark.conf.get(_CONF) == ROCKSDB_PROVIDER
    yield spark
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _state_files(ckpt):
    out = []
    for root, _dirs, files in os.walk(os.path.join(ckpt, "state")):
        out += [os.path.join(root, f) for f in files]
    return out


def test_sessionization_on_rocksdb_matches_default(rocksdb, tmp_path):
    spark = rocksdb
    from leidenalg_spark.streaming.stateful import run_sessionization

    in_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    s = dt.timedelta(seconds=1)
    rows = [
        ("convA", 0, "user", "x", None, T0),
        ("convA", 1, "assistant", "x", "tool_1", T0 + 10 * s),
        ("convA", 2, "user", "x", None, T0 + 20 * s),
        ("convA", 3, "user", "x", None, T0 + dt.timedelta(hours=2)),
        ("convB", 0, "user", "x", None, T0 + 5 * s),
    ]
    spark.createDataFrame(rows, _SCHEMA).write.mode("append").parquet(in_dir)
    run_sessionization(spark, in_dir, ckpt, out, gap="30 minutes", watermark="1 hour")
    spark.createDataFrame(
        [("zz1", 0, "user", "x", None, T0 + dt.timedelta(days=30))], _SCHEMA
    ).write.mode("append").parquet(in_dir)
    run_sessionization(spark, in_dir, ckpt, out, gap="30 minutes", watermark="1 hour")
    spark.createDataFrame(
        [("zz2", 0, "user", "x", None, T0 + dt.timedelta(days=60))], _SCHEMA
    ).write.mode("append").parquet(in_dir)
    run_sessionization(spark, in_dir, ckpt, out, gap="30 minutes", watermark="1 hour")

    got = (
        spark.read.parquet(out).toPandas()
        .query("~conv_id.str.startswith('zz')")
        .sort_values(["conv_id", "session_ord"])
        .reset_index(drop=True)
    )
    # same sessions the default-provider test asserts (gap split + timeout)
    assert list(got["conv_id"]) == ["convA", "convA", "convB"]
    assert list(got["n_turns"]) == [3, 1, 1]
    # the checkpoint holds RocksDB artifacts, not HDFS heap snapshots
    files = _state_files(ckpt)
    assert files, "stateful query must have written state"
    assert any(f.endswith((".zip", ".changelog")) for f in files), files[:10]
    assert not any(f.endswith(".delta") for f in files), files[:10]


def test_attribution_interval_join_on_rocksdb(rocksdb, tmp_path):
    spark = rocksdb
    from datetime import datetime, timedelta

    from leidenalg_spark.streaming.attribution import (
        batch_attribution_pairs,
        run_streaming_attribution,
    )

    t0 = datetime(2024, 1, 1)
    in_path, out, ck = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")

    def ev(uid, secs, typ, eid):
        return (uid, t0 + timedelta(seconds=secs), typ, eid, 0.0)

    first = [
        ev(1, 0, "ad", 1), ev(1, 100, "email", 2), ev(1, 200, "purchase", 3),
        ev(2, 0, "ad", 4),
        ev(3, 0, "ad", 5), ev(3, 5000, "purchase", 6),
    ]
    sch = "user_id long, ts timestamp, event_type string, event_id long, value double"
    spark.createDataFrame(first, sch).write.mode("append").parquet(in_path)
    pairs_path = run_streaming_attribution(spark, in_path, ck, out)

    got = {
        (r.user_id, r.conv_ts, r.touch_ts, r.touch_type)
        for r in spark.read.parquet(pairs_path).collect()
    }
    want = {
        (r.user_id, r.conv_ts, r.touch_ts, r.touch_type)
        for r in batch_attribution_pairs(spark.read.parquet(in_path)).collect()
    }
    assert got == want and len(got) == 2
    files = _state_files(ck)
    assert any(f.endswith((".zip", ".changelog")) for f in files), files[:10]
    assert not any(f.endswith(".delta") for f in files), files[:10]
