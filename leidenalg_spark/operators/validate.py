"""Data-quality validation operators — the expectation-suite layer a
100-TB ingest runs BEFORE anything downstream trusts a table (the
Great-Expectations/dbt-test shape, engine-native).

Reference scope note: vtraag/leidenalg assumes its igraph inputs are
well-formed; at pipeline scale the edge/event/document tables arrive
from upstream systems and malformed rows silently corrupt every
operator after them — these checks are the admission gate.

All checks are single-pass aggregates (map-side combinable) or one
equi-join; nothing here is row-at-a-time Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_expectations(df: DataFrame, checks: dict) -> DataFrame:
    """Evaluate named row-level expectations in ONE pass: ``checks`` maps
    rule name → boolean Column (e.g. ``{"ts_not_null": F.col("ts").
    isNotNull(), "value_nonneg": F.col("value") >= 0}``).  NULL predicate
    results count as failures (an expectation that cannot be evaluated
    did not pass).  Returns one row per rule:
    (rule, n_rows, n_pass, pass_rate, ok) with ``ok`` = all rows passed.

    Scale shape: every rule folds into the SAME single aggregate scan —
    adding a rule adds a column, not a pass; the per-rule pivot is a
    |rules|-row stack of the 1-row result.
    """
    if not checks:
        raise ValueError("at least one check required")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, cond in checks.items():
        if not isinstance(cond, Column):
            raise TypeError(f"check {name!r} must be a Column expression")
        aggs.append(
            F.sum(F.coalesce(cond.cast("boolean"), F.lit(False)).cast("long")).alias(name)
        )
    row = df.agg(*aggs)
    stacked = None
    for name in checks:
        part = row.select(
            F.lit(name).alias("rule"),
            F.col("_n").alias("n_rows"),
            F.col(name).alias("n_pass"),
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    return stacked.select(
        "rule", "n_rows", "n_pass",
        F.round(F.when(F.col("n_rows") > 0, F.col("n_pass") / F.col("n_rows")), 6)
        .alias("pass_rate"),
        (F.col("n_pass") == F.col("n_rows")).alias("ok"),
    )


def referential_integrity(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """Foreign-key audit: one row summarising how many child rows point
    at a parent key that does not exist (orphans) — the join-correctness
    precondition for every downstream equi-join (an orphaned edge
    endpoint silently vanishes from an inner-join gather).  NULL child
    keys are counted separately: they are not orphans, but they drop out
    of joins just the same.  Returns (n_child, n_null_key, n_orphan,
    orphan_rate, ok).

    Scale shape: one distinct on the parent key + one left-anti-style
    aggregate join keyed on the child key — the exact shuffle a real
    join would do, so the audit costs what one join costs and no more.
    """
    pk = parent.select(F.col(parent_key).alias("_pk")).where(
        F.col(parent_key).isNotNull()
    ).distinct()
    ck = child.select(F.col(child_key).alias("_ck"))
    joined = ck.join(pk, ck["_ck"] == pk["_pk"], "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_child"),
        F.sum(F.col("_ck").isNull().cast("long")).alias("n_null_key"),
        F.sum((F.col("_ck").isNotNull() & F.col("_pk").isNull()).cast("long")).alias("n_orphan"),
    ).select(
        "n_child", "n_null_key", "n_orphan",
        F.round(F.when(F.col("n_child") > 0, F.col("n_orphan") / F.col("n_child")), 6)
        .alias("orphan_rate"),
        (F.col("n_orphan") == 0).alias("ok"),
    )
