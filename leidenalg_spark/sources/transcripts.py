"""Synthetic multi-turn conversation/agent transcripts.

Schema is exactly the BASELINE.json input_hint:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``.

The generator is a pure function of ``(seed, n_convs, max_turns)`` built
from ``spark.range`` + hash-based column expressions — no Python RNG
state, no UDFs — so the identical table is reproduced at any scale and
any parallelism (FIXTURES.md §1).  ``spark.range`` parallelises the
generation across the cluster; per-conversation turn explosion keeps
rows clustered by ``conv_id``, which is also the window-partition key of
the edge derivation downstream (no extra shuffle between generation and
derivation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ["user", "assistant", "tool"]


def synthetic_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    max_turns: int = 20,
    n_tools: int = 50,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic transcripts table (FIXTURES.md §1).

    - roles cycle user → assistant → tool
    - ``tool`` is set on 'tool' turns, drawn from a Zipf-ish pool
      (``tool_0`` is by far the most frequent → deterministic hub/skew)
    - ``ts`` = 2026-01-01T00:00:00Z + conv*3600s + turn*10s
    """
    convs = spark.range(0, n_convs, 1, numPartitions=partitions)
    n_turns = (F.lit(4) + F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(max(1, max_turns - 3)))).cast("int")
    t = (
        convs.withColumn("turn_idx", F.explode(F.sequence(F.lit(0), n_turns - 1)))
        .withColumn("conv_id", F.format_string("conv_%08d", F.col("id")))
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
    )
    role = F.element_at(F.array(*[F.lit(r) for r in ROLES]), F.pmod("turn_idx", F.lit(3)).cast("int") + 1)
    # Zipf-ish tool pool: cube of a uniform hash concentrates mass near 0
    u = F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(seed + 1)), F.lit(1000)) / 1000.0
    tool_j = F.floor(F.pow(u, F.lit(3.0)) * n_tools).cast("int")
    tool = F.when(role == "tool", F.format_string("tool_%d", tool_j))
    text = F.format_string(
        "c%d t%d %s",
        F.col("id"),
        F.col("turn_idx"),
        F.hex(F.xxhash64("conv_id", "turn_idx", F.lit(seed + 2))),
    )
    ts = F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(
        secs=F.col("id") * 3600 + F.col("turn_idx") * 10
    )
    return t.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


def transcripts_from_events(events: DataFrame) -> DataFrame:
    """Deterministic events→transcripts adapter: recast the event stream
    as input_hint-shaped conversations (``conv_id`` = user, turns in
    stable ``(ts, event_id)`` order, roles alternating user/assistant,
    ``tool`` set on click/purchase turns).  Pure window + column
    expressions — SQL-twinnable, so oracle checks can replay transcript
    operators on the shared parquet tables.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rn = F.row_number().over(w)
    return events.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (rn - 1).cast("int").alias("turn_idx"),
        F.when(rn % 2 == 1, F.lit("user")).otherwise(F.lit("assistant")).alias("role"),
        F.col("event_type").alias("text"),
        F.when(F.col("event_type") == "click", F.lit("browser"))
        .when(F.col("event_type") == "purchase", F.lit("checkout"))
        .alias("tool"),
        F.col("ts"),
    )
