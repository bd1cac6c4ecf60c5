"""State-store provider selection for the stateful streaming operators.

The default HDFS-backed provider keeps every key's state on the executor
HEAP between snapshots — at the 100-TB / 10^12-turn horizon the
sessionization and stream-stream-join state (bounded by the watermark
horizon, but still billions of live keys) must live off-heap with
incremental checkpointing instead.  Spark ships
``RocksDBStateStoreProvider`` for exactly this; it is a per-query conf
(read at query START from the session), so it can be flipped at runtime
before ``writeStream.start()`` — no session rebuild needed.

Reference scale envelope: /root/reference/README.rst:6-7 (the reference
is single-node; the streaming state horizon is this repo's extension).
"""

from __future__ import annotations

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_CONF = "spark.sql.streaming.stateStore.providerClass"


def rocksdb_conf() -> dict:
    """The session/builder conf dict for RocksDB-backed streaming state —
    pass to ``get_spark(extra=...)`` or apply via
    :func:`use_rocksdb_state_store`.  Changelog checkpointing makes each
    micro-batch upload only the delta, not a full SST snapshot."""
    return {
        _CONF: ROCKSDB_PROVIDER,
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
        # bound the block cache so state memory is explicit, not
        # heap-competing.  maxMemoryUsageMB is INERT unless
        # boundedMemoryUsage=true (RocksDBMemoryManager gates the shared
        # write-buffer-manager/cache on it, default false) — without the
        # gate every state-store instance gets its own unbounded cache.
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
        "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB": "512",
    }


def use_rocksdb_state_store(spark) -> None:
    """Flip the CURRENT session's stateful streaming queries (started
    after this call) onto RocksDB state stores."""
    for k, v in rocksdb_conf().items():
        spark.conf.set(k, v)


def current_provider(spark) -> str:
    return spark.conf.get(_CONF, "HDFSBackedStateStoreProvider (default)")
