"""Table I/O: Iceberg catalogs with a parquet-path fallback.

The production deployment (BASELINE.json north rule) reads transcript
turns from an Iceberg table and writes per-superstep membership /
quality / lineage checkpoints back to Iceberg so runs resume
mid-iteration.  This sandbox ships no Iceberg runtime jar, so every
entry point here degrades to plain parquet paths with identical
semantics — the calling code is unchanged between the two:

- a *table ref* is either ``catalog.db.table`` (contains no ``/``) and
  resolved through the session catalog, or a filesystem/objectstore
  path and resolved as parquet;
- ``write_table(..., mode="overwrite_partitions")`` maps to Iceberg's
  dynamic partition overwrite (`overwritePartitions()`), the idempotent
  re-run primitive, and to parquet's
  ``partitionOverwriteMode=dynamic`` otherwise.

Iceberg specifics that matter at 10^12 rows and are encoded in
`TRANSCRIPT_TABLE_DDL`: partition by days(ts) + bucket(conv_id) so the
edge-derivation window (partitionBy conv_id) prunes buckets, and
snapshot isolation gives the resume path a consistent view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

# DDL applied when an Iceberg catalog is present (see docstring).
TRANSCRIPT_TABLE_DDL = """
CREATE TABLE IF NOT EXISTS {ref} (
  conv_id string, turn_idx int, role string, text string, tool string, ts timestamp
) USING iceberg
PARTITIONED BY (days(ts), bucket(256, conv_id))
TBLPROPERTIES ('write.distribution-mode' = 'hash')
"""


def is_table_ref(ref: str) -> bool:
    """catalog.db.table (no slash) vs filesystem path."""
    return "/" not in ref and "\\" not in ref


def iceberg_available(spark: SparkSession, ref: str) -> bool:
    """True when ``ref`` resolves through a configured table catalog:
    either its first component names an explicit catalog
    (``spark.sql.catalog.<name>``), or the SESSION catalog itself is
    replaced (``spark.sql.catalog.spark_catalog`` — the common Iceberg
    deployment), in which case ``db.table`` and bare-table refs resolve
    through it too."""
    if not is_table_ref(ref):
        return False
    catalog = ref.split(".", 1)[0]
    if spark.conf.get(f"spark.sql.catalog.{catalog}", None) is not None:
        return True
    return spark.conf.get("spark.sql.catalog.spark_catalog", None) is not None


def read_table(spark: SparkSession, ref: str, schema: str | None = None) -> DataFrame:
    if is_table_ref(ref):
        return spark.read.table(ref)
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "append", partition_by=()) -> None:
    """Write to an Iceberg table ref or a parquet path.

    mode: 'append' | 'overwrite' | 'overwrite_partitions' (dynamic).
    """
    if is_table_ref(ref):
        spark = df.sparkSession
        if not iceberg_available(spark, ref):
            raise ValueError(
                f"table ref {ref!r} has no configured Spark catalog "
                f"(spark.sql.catalog.{ref.split('.', 1)[0]} is unset) — "
                "configure an Iceberg catalog or pass a filesystem path"
            )
        w = df.writeTo(ref)
        if mode == "append":
            w.append()
        elif mode == "overwrite_partitions":
            w.overwritePartitions()
        elif mode == "overwrite":
            if spark.catalog.tableExists(ref):
                # row-level overwrite keeps the table's partition spec and
                # TBLPROPERTIES (createOrReplace would drop and recreate
                # the table with none of them)
                from pyspark.sql import functions as F

                w.overwrite(F.lit(True))
            else:
                w.using("iceberg").create()
        else:
            raise ValueError(f"unknown mode {mode!r}")
        return
    writer = df.write
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if mode == "overwrite_partitions":
        writer = writer.option("partitionOverwriteMode", "dynamic")
        mode = "overwrite"
    writer.mode(mode).parquet(ref)


def read_transcripts(spark: SparkSession, ref: str) -> DataFrame:
    """Transcript turns with the input_hint schema, from Iceberg or parquet.

    Validates against the table's *actual* schema (imposing the expected
    schema on the read would mask missing columns until action time),
    then projects in canonical column order.
    """
    df = read_table(spark, ref)
    expected = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    missing = set(expected) - set(df.columns)
    if missing:
        raise ValueError(f"transcript table {ref} missing columns {sorted(missing)}")
    return df.select(*expected)
