"""Event-stream relational operators Spark lacks as built-ins,
re-expressed as single-shuffle DataFrame plans.

``asof_join`` is the classic temporal-attribution operator (join every
left event to the latest right event at-or-before it, per key).  Spark
has no ASOF JOIN; the naive spelling — an inequality theta-join plus a
per-left-row argmax — is a quadratic range join that dies on the first
hot key.  The scale-correct plan is the union-and-carry-forward trick:

1. tag both inputs and union them into one (key, ts, side, payload)
   stream — a metadata-only plan, no data movement;
2. ONE hash exchange on the key, sort by (ts, side, tiebreak) within
   each partition — right rows sort before left rows at equal ts, which
   is exactly the inclusive ``l.ts >= r.ts`` ASOF bound;
3. ``last(right_payload, ignorenulls=True)`` over the running window
   carries the most recent right row forward; filtering back to left
   rows completes the join.

Cost is one shuffle + one sort — identical to the sort-merge join Spark
would run for an equi-join on the same key, and per-key skew behaves
like any window function (a hot key is a big sorted run, not a
quadratic pair blow-up).  At 10^12 rows on a source bucketed by the key
the exchange disappears entirely.

``value_profile`` (exact ordered percentiles per group) and
``event_windows`` (tumbling-window aggregation, the batch twin of the
Structured-Streaming windowed agg) are thin declarative wrappers kept
here so the driver queries share one audited home.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _day_or_coarser(bucket: str) -> bool:
    return bucket in ("day", "week", "month", "quarter", "year")


def _bucket_out(col, bucket: str):
    """Bucket columns stay midnight TIMESTAMPs at every granularity: both
    engines' date_trunc returns timestamp, so collected values surface as
    datetime64 on both sides of the correctness harness (the peak_days /
    stickiness convention) and value-compares agree byte-for-byte.  A DATE
    cast here would collect as python ``date`` objects (pandas object
    dtype) and string-compare differently from the oracle's datetime64."""
    return col


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    tiebreak: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of LEFT join: every left row gains the payload of the
    latest right row with the same ``key`` and ``right_ts <= left_ts``
    (inclusive), or NULLs when no right row precedes it.

    ``right_cols`` are the right payload columns to carry (returned as
    ``<name><suffix>`` plus ``<right_ts><suffix>``).  ``tiebreak``
    orders right rows that share an exact timestamp (latest-in-order
    wins) — pass a unique column for deterministic output.  Matches
    DuckDB ``ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts``
    when right rows are unique per (key, ts).
    """
    carry_src = [right_ts, *right_cols]
    carried = [f"{c}{suffix}" for c in carry_src]
    lpay = [c for c in left.columns if c not in (key, left_ts)]

    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lpay],
        *[F.lit(None).cast(right.schema[c].dataType).alias(a) for c, a in zip(carry_src, carried)],
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        *[F.col(c).alias(a) for c, a in zip(carry_src, carried)],
    )
    order = [F.col("_t").asc(), F.col("_side").asc()]
    if tiebreak is not None:
        # right rows order by their tiebreak at equal ts; left rows all
        # see the full set of equal-ts right rows regardless
        order.append(F.col(f"{tiebreak}{suffix}" if tiebreak in carry_src else tiebreak).asc_nulls_first())
    w = Window.partitionBy("_k").orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned = l_tag.unionByName(r_tag)
    filled = unioned.select(
        "_k", "_t", "_side", *lpay,
        *[F.last(a, ignorenulls=True).over(w).alias(a) for a in carried],
    )
    return filled.where(F.col("_side") == 1).select(
        F.col("_k").alias(key), F.col("_t").alias(left_ts), *lpay, *carried
    )


def value_profile(
    df: DataFrame,
    group: str,
    value: str,
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact per-group distribution profile: count, mean, min, max and
    linearly-interpolated percentiles (``percentile``, the exact sort-
    based aggregate — same rank formula p*(n-1) as ANSI
    ``quantile_cont`` / ``percentile_cont``).

    One hash aggregation; the exact percentile buffers each group's
    values, so at 10^12 rows use this per bounded group (event types,
    sources, languages — cardinality ≪ rows) and reach for
    ``approx_percentile`` when a single group's values exceed executor
    memory.
    """
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(value), 6).alias("mean"),
        F.round(F.min(value), 6).alias("vmin"),
        F.round(F.max(value), 6).alias("vmax"),
    ]
    for p in percentiles:
        aggs.append(F.round(F.percentile(value, F.lit(p)), 6).alias(f"p{int(round(p * 100)):02d}"))
    return df.groupBy(F.col(group)).agg(*aggs)


def window_expr(ts_col: str, width: str, slide: str | None):
    """Validated tumbling/hopping window bucket expression — the ONE
    place the slide-vs-width guard and window construction live
    (event_windows, trending_topk and streaming.trending all route
    through it, so the gapped-sampling rejection can't drift apart)."""
    if slide is not None:
        ws, ss = _interval_seconds(width), _interval_seconds(slide)
        if ws is not None and ss is not None and ss > ws:
            raise ValueError(
                f"slide ({slide}) must not exceed width ({width}); "
                "gapped sampling windows drop events silently"
            )
        return F.window(F.col(ts_col), width, slide)
    return F.window(F.col(ts_col), width)


def retention_cohorts(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    bucket: str = "week",
) -> DataFrame:
    """Retention-cohort table: keys are cohorted by their FIRST activity
    bucket; each (cohort, offset) cell counts the keys of that cohort
    active ``offset`` buckets later.  Returns (cohort_start, offset,
    n_active) — offset 0 is the cohort size.

    Scale shape: one min-aggregate for first-seen, one distinct over
    (key, bucket) activity, one join + hash aggregate — every step
    map-side combinable, output |buckets|² cells.
    """
    tb = F.date_trunc(bucket, F.col(ts_col))
    first = df.groupBy(key).agg(F.min(tb).alias("cohort_start"))
    active = df.select(key, tb.alias("b")).distinct()
    # integral bucket offset: truncate to whole buckets via epoch diff
    # of the truncated timestamps (weeks are fixed-length; month-bucket
    # offsets should use months_between instead)
    secs = {"week": 604800, "day": 86400, "hour": 3600}[bucket]
    off = (
        (F.unix_micros(F.col("b").cast("timestamp"))
         - F.unix_micros(F.col("cohort_start").cast("timestamp"))) / F.lit(secs * 1e6)
    ).cast("long")
    return (
        active.join(first, key)
        .select(
            _bucket_out(F.col("cohort_start"), bucket).alias("cohort_start"),
            off.alias("offset"),
        )
        .groupBy("cohort_start", "offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def trending_topk(
    df: DataFrame,
    ts_col: str = "ts",
    label: str = "event_type",
    width: str = "1 hour",
    slide: str | None = None,
    k: int = 3,
) -> DataFrame:
    """Top-k labels per (tumbling or hopping) window by event count —
    the batch twin of :func:`..streaming.trending.run_trending` (same
    bucketing, same rank tiebreak: count desc, label asc).  Returns
    (window_start, label, n, rank).

    One hash aggregate + one bounded per-window rank window
    (|labels|-deep partitions, never a global sort).
    """
    w = window_expr(ts_col, width, slide)
    counts = (
        df.groupBy(w.alias("w"), F.col(label))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), label, "n")
    )
    r = F.row_number().over(
        Window.partitionBy("window_start").orderBy(F.desc("n"), F.asc(label))
    )
    return counts.withColumn("rank", r.cast("long")).where(F.col("rank") <= k)


def funnel(
    df: DataFrame,
    steps: list[str],
    key: str = "user_id",
    ts_col: str = "ts",
    label: str = "event_type",
    horizon_s: float | None = None,
) -> DataFrame:
    """Ordered-funnel completion counts: a key completes step k when an
    event labelled ``steps[k]`` occurs STRICTLY after its completion
    time of step k−1 (first match wins — as-of semantics, so revisits
    don't double-count).  ``horizon_s`` optionally bounds the whole
    funnel to ``steps[0]``'s time + horizon seconds.  Returns one row
    per step: (step_idx, step, n_keys).

    Scale shape: the label filter prunes the scan to funnel events
    only; then one pass per step — an equi-join of that step's events
    against the (key, t_prev) table plus one hash aggregate
    (min-ts-after), each shuffling O(step events + surviving keys).
    No window over the full stream, no explode, no driver loop over
    keys; k (a handful) sequential jobs total.
    """
    if len(steps) < 1:
        raise ValueError("at least one funnel step required")
    ev = df.select(key, ts_col, label).where(F.col(label).isin(list(steps)))
    # eager localCheckpoint per pass (kernels convention): each step table
    # feeds two consumers (next pass + its own count) — materialise once,
    # truncate lineage, let the block manager reclaim on GC (no persist
    # leak, no O(k²) recompute chain in the final union plan)
    cur = (
        ev.where(F.col(label) == steps[0])
        .groupBy(key)
        .agg(F.min(ts_col).alias("t"))
        .withColumn("t0", F.col("t"))
        .localCheckpoint(eager=True)
    )
    out_rows = [
        cur.agg(F.count(F.lit(1)).alias("n_keys")).select(
            F.lit(1).alias("step_idx"), F.lit(steps[0]).alias("step"), "n_keys"
        )
    ]
    for k, name in enumerate(steps[1:], start=2):
        nxt = ev.where(F.col(label) == name).join(
            cur.select(key, F.col("t").alias("tprev"), "t0"), key
        ).where(F.col(ts_col) > F.col("tprev"))
        if horizon_s is not None:
            # epoch via unix_micros (NTZ won't cast to double under ANSI);
            # only the DIFFERENCE matters, so timezone cancels
            ep = lambda c: F.unix_micros(F.col(c).cast("timestamp")) / 1e6  # noqa: E731
            nxt = nxt.where(ep(ts_col) <= ep("t0") + float(horizon_s))
        cur = (
            nxt.groupBy(key)
            .agg(F.min(ts_col).alias("t"), F.min("t0").alias("t0"))
            .localCheckpoint(eager=True)
        )
        out_rows.append(
            cur.agg(F.count(F.lit(1)).alias("n_keys")).select(
                F.lit(k).alias("step_idx"), F.lit(name).alias("step"), "n_keys"
            )
        )
    res = out_rows[0]
    for r in out_rows[1:]:
        res = res.unionByName(r)
    return res


_INTERVAL_UNIT_S = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _interval_seconds(s: str) -> float | None:
    """Best-effort parse of simple '<n> <unit>' interval strings; None
    for anything exotic (validation is then left to Spark)."""
    parts = str(s).strip().lower().split()
    if len(parts) != 2 or parts[1] not in _INTERVAL_UNIT_S:
        return None
    try:
        return float(parts[0]) * _INTERVAL_UNIT_S[parts[1]]
    except ValueError:
        return None


def event_windows(
    df: DataFrame,
    ts_col: str = "ts",
    label: str = "event_type",
    value: str = "value",
    width: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling or hopping window aggregation — the batch twin of the
    Structured Streaming windowed count (same ``F.window`` bucketing, so
    a ``readStream`` source with a watermark produces identical rows).
    One hash aggregate on (bucket, label).  Tumbling (``slide=None``)
    window assignment is a pure projection, no blow-up; hopping
    (``slide`` < ``width``) fans each row out to exactly
    ``width/slide`` overlapping windows — a bounded, intentional
    constant factor, not a join.  Returns (window_start, label, n,
    total).
    """
    w = window_expr(ts_col, width, slide)
    return (
        df.groupBy(w.alias("w"), F.col(label))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum(value), 6).alias("total"))
        .select(F.col("w.start").alias("window_start"), label, "n", "total")
    )


def anomaly_windows(
    df: DataFrame,
    ts_col: str = "ts",
    label: str = "event_type",
    width: str = "1 hour",
    baseline: int = 6,
    threshold: float = 3.0,
) -> DataFrame:
    """Trailing z-score anomaly detection over tumbling window counts —
    the monitoring query every event pipeline runs ("did this event
    type spike this hour vs its recent history?").

    Per (label, window) the count is compared to the mean/stddev of the
    previous ``baseline`` OBSERVED windows (rows, not time range — empty
    windows don't emit rows, matching the streaming twin's output);
    ``zscore`` is NULL until two baseline windows exist or when the
    baseline is constant, and ``is_anomaly`` is false there.

    Scale shape: one hash aggregate on (window, label) collapses the
    stream to |labels|·|windows| rows, then the trailing window runs on
    that tiny table — the second exchange moves per-label-per-bucket
    counts, never events.  Output (window_start, label, n,
    baseline_mean, zscore, is_anomaly).
    """
    w = window_expr(ts_col, width, None)
    counts = df.groupBy(w.alias("w"), F.col(label)).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).select(F.col("w.start").alias("window_start"), label, "n")
    trail = (
        Window.partitionBy(label)
        .orderBy("window_start")
        .rowsBetween(-baseline, -1)
    )
    mu = F.avg("n").over(trail)
    sd = F.stddev_samp("n").over(trail)
    z = F.when(sd > 0, (F.col("n") - mu) / sd)
    return counts.select(
        "window_start",
        label,
        "n",
        F.round(mu, 6).alias("baseline_mean"),
        F.round(z, 6).alias("zscore"),
        F.coalesce(F.abs(z) >= F.lit(float(threshold)), F.lit(False)).alias(
            "is_anomaly"
        ),
    )


def burstiness(
    events: DataFrame, id_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Per-actor activity burstiness (Goh & Barabási 2008): over the
    actor's inter-event gaps, ``B = (σ − μ) / (σ + μ)`` — −1 for a
    perfectly periodic actor, ≈0 for Poisson arrivals, →1 for bursty
    ones — plus the gap mean and coefficient of variation.  Actors with
    fewer than 2 gaps are dropped (σ undefined).  Returns (user_id,
    n_gaps, mean_gap_s, cv, burstiness), 1e-6 rounded.

    Scale: one window lag partitioned by actor (per-actor sorted runs,
    the sessionize shape — no global sort) + one hash aggregate;
    timestamps go through unix_micros (NTZ-safe, matches DuckDB
    ``epoch()`` exactly in the UTC session).
    """
    from pyspark.sql import Window

    sec = F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(1e6)
    w = Window.partitionBy(id_col).orderBy(ts_col, "event_id")
    g = events.select(
        F.col(id_col), (sec - F.lag(sec).over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    mu = F.avg("gap")
    sd = F.stddev_pop("gap")
    return (
        g.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.round(mu, 6).alias("mean_gap_s"),
            F.round(F.when(mu > 0, sd / mu), 6).alias("cv"),
            F.round(F.when((sd + mu) > 0, (sd - mu) / (sd + mu)), 6).alias("burstiness"),
        )
        .where(F.col("n_gaps") >= 2)
    )


def periodicity(
    events: DataFrame, lag: int = 24, type_col: str = "event_type", ts_col: str = "ts"
) -> DataFrame:
    """Circadian-rhythm detector: per event type, the Pearson
    autocorrelation of the hourly count series at ``lag`` buckets
    (24 = daily cycle) over the DENSIFIED series — missing hours count
    0, without which gaps masquerade as rhythm.  Returns
    (event_type, n_pairs, acf), 1e-6 rounded; types whose series is
    constant (zero variance) return NULL acf.

    Scale: counts are one window-bucket hash aggregate; densification
    joins the (types × hour-range) frame — hour cardinality is
    time-span-bounded, types catalog-bounded, so the dense frame is a
    cross join of two SMALL dims, never event-scaled; the lag pairing is
    one equi-join on (type, bucket+lag) and the correlation one
    combinable aggregate.
    """
    b = F.window(F.col(ts_col), "1 hour").start.alias("bucket")
    counts = events.groupBy(F.col(type_col).alias("etype"), b).agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    span = counts.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    hours = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("bucket")
    )
    types = counts.select("etype").distinct()
    dense = (
        types.crossJoin(hours)
        .join(counts, ["etype", "bucket"], "left")
        .na.fill({"c": 0.0})
    )
    lagged = dense.select(
        "etype",
        (F.col("bucket") + F.expr(f"INTERVAL {int(lag)} HOURS")).alias("bucket"),
        F.col("c").alias("c_prev"),
    )
    # explicit Pearson with a zero-variance guard: under ANSI mode
    # F.corr THROWS DIVIDE_BY_ZERO on a constant series instead of
    # returning NULL (DuckDB's corr() returns NULL — match that)
    num = F.covar_pop("c_prev", "c")
    den = F.stddev_pop("c_prev") * F.stddev_pop("c")
    return (
        dense.join(lagged, ["etype", "bucket"])
        .groupBy(F.col("etype").alias(type_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.when(den > 0, num / den), 6).alias("acf"),
        )
    )


def lifecycle_accounting(
    events: DataFrame, id_col: str = "user_id", ts_col: str = "ts", width_days: int = 7
) -> DataFrame:
    """Growth-accounting state machine (the WAU/MAU accounting every
    product analyst draws): per ``width_days`` bucket, how many actors
    are NEW (first-ever bucket), RETAINED (also active the previous
    bucket), RESURRECTED (active, but last seen before the previous
    bucket), and CHURNED (active the previous bucket, absent now).
    Churn is attributed to the bucket the actor went missing, bounded by
    the corpus horizon.  Returns (bucket, state, n_users) — buckets are
    epoch-day indexes divided by ``width_days``.

    Scale: one distinct (actor, bucket) aggregate, a min-bucket
    aggregate, two self-joins on (actor, bucket−1) — all equality-keyed
    and combinable; the horizon rides a 1-row broadcast cross join.
    """
    wk = (
        F.datediff(F.to_date(F.col(ts_col)), F.lit("1970-01-01").cast("date"))
        / F.lit(int(width_days))
    ).cast("long")
    act = events.select(F.col(id_col).alias("u"), wk.alias("wk")).distinct()
    first = act.groupBy("u").agg(F.min("wk").alias("first_wk"))
    prev = act.select("u", (F.col("wk") + 1).alias("wk"), F.lit(1).alias("was_active"))
    cur = (
        act.join(first, "u")
        .join(prev, ["u", "wk"], "left")
        .select(
            "wk",
            F.when(F.col("wk") == F.col("first_wk"), F.lit("new"))
            .when(F.col("was_active").isNotNull(), F.lit("retained"))
            .otherwise(F.lit("resurrected"))
            .alias("state"),
        )
    )
    horizon = act.agg(F.max("wk").alias("max_wk"))
    churn = (
        prev.join(act, ["u", "wk"], "left_anti")
        .crossJoin(F.broadcast(horizon))
        .where(F.col("wk") <= F.col("max_wk"))
        .select("wk", F.lit("churned").alias("state"))
    )
    return (
        cur.unionByName(churn)
        .groupBy("wk", "state")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(F.col("wk").cast("long").alias("bucket"), "state", "n_users")
    )


def rfm_scores(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n_tiles: int = 5,
) -> DataFrame:
    """RFM (recency / frequency / monetary) scoring — the classic
    actor-value segmentation (Hughes 1994): per actor, days since last
    event (vs the corpus horizon), event count, and summed value, each
    mapped to a 1..``n_tiles`` quantile score, plus the combined
    ``rfm = 100·r + 10·f + m`` segment code.

    Scores are HISTOGRAM quantiles, not per-row NTILE: score =
    ceil(n_tiles · cum_n / n) where cum_n counts actors at-or-better
    than the actor's metric VALUE — ties share a score, so no global
    per-row window ever runs.  The only ordered windows run over the
    grouped metric histograms: recency is bounded by the corpus
    day-span, frequency by the max activity count, and monetary is
    quantised to 2 decimals to keep its histogram bounded too.  Each
    histogram rides back on a metric-value equality join; the corpus
    horizon and actor count are 1-row broadcast cross joins.
    """
    from pyspark.sql import Window

    per = events.groupBy(F.col(id_col).alias("u")).agg(
        F.max(F.to_date(F.col(ts_col))).alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.round(F.sum(F.col(value_col)), 2).alias("monetary"),
    )
    horizon = events.agg(
        F.max(F.to_date(F.col(ts_col))).alias("max_day"),
        F.countDistinct(id_col).cast("long").alias("n"),
    )
    per = per.crossJoin(F.broadcast(horizon)).select(
        "u",
        F.datediff("max_day", "last_day").cast("long").alias("recency_days"),
        "frequency",
        "monetary",
        "n",
    )

    def _tile(df, metric, best_high, out):
        # cumulative actor count over the grouped metric histogram,
        # ordered worst→best, so the best values take cum_n = n → top tile
        order = F.col(metric).asc() if best_high else F.col(metric).desc()
        hist = df.groupBy(metric, "n").agg(F.count(F.lit(1)).alias("c"))
        w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
        tiles = hist.select(
            metric,
            F.ceil(F.lit(n_tiles) * F.sum("c").over(w) / F.col("n"))
            .cast("long")
            .alias(out),
        )
        return df.join(tiles, metric)

    out = _tile(per, "recency_days", False, "r_score")
    out = _tile(out, "frequency", True, "f_score")
    out = _tile(out, "monetary", True, "m_score")
    return out.select(
        F.col("u").alias(id_col),
        "recency_days",
        "frequency",
        F.round("monetary", 6).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        (100 * F.col("r_score") + 10 * F.col("f_score") + F.col("m_score"))
        .cast("long")
        .alias("rfm"),
    )


def json_field_stats(
    events: DataFrame,
    field: str = "k",
    json_col: str = "props",
    group_col: str = "event_type",
) -> DataFrame:
    """Semi-structured payload profiling: extract one numeric field
    from a JSON string column (``get_json_object`` — JVM-side JSON
    path, no Python) and profile it per group — the schema-discovery
    step every event pipeline runs before promoting a JSON property to
    a real column.  Returns ``(group, n, n_missing, vmin, vmax, mean,
    median)``; rows whose JSON lacks the field (or fails to parse)
    count as missing.

    Scale: ONE hash aggregate over the extracted column; the exact
    median buffers per-group values (bounded group cardinality — same
    contract as value_profile; use approx_percentile past that).
    """
    v = F.get_json_object(F.col(json_col), f"$.{field}").cast("double")
    return (
        events.select(F.col(group_col).alias("grp"), v.alias("v"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("v").isNull().cast("long")).alias("n_missing"),
            F.round(F.min("v"), 6).alias("vmin"),
            F.round(F.max("v"), 6).alias("vmax"),
            F.round(F.avg("v"), 6).alias("mean"),
            F.round(F.percentile("v", F.lit(0.5)), 6).alias("median"),
        )
        .withColumnRenamed("grp", group_col)
    )


def ltv_cohorts(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "week",
) -> DataFrame:
    """Cohort LTV triangle — the revenue sibling of
    :func:`retention_cohorts`: keys cohort by first-activity bucket,
    and each (cohort, offset) cell reports that cohort's value in the
    offset bucket plus the RUNNING cumulative value per surviving
    member (the LTV curve every growth model fits).  Returns
    (cohort_start, offset, n_active, bucket_value, cum_value,
    cum_value_per_user) with cohort size = n_active at offset 0.

    Scale shape: retention_cohorts' joins + ONE extra value sum; the
    cumulative window runs per cohort over offsets — bounded by the
    corpus bucket span, never by users.
    """
    from pyspark.sql import Window

    tb = F.date_trunc(bucket, F.col(ts_col))
    first = df.groupBy(key).agg(F.min(tb).alias("cohort_start"))
    secs = {"week": 604800, "day": 86400, "hour": 3600}[bucket]
    act = df.select(key, tb.alias("b"), F.col(value_col).alias("v")).join(first, key)
    off = (
        (F.unix_micros(F.col("b").cast("timestamp"))
         - F.unix_micros(F.col("cohort_start").cast("timestamp"))) / F.lit(secs * 1e6)
    ).cast("long")
    cell = (
        act.select(key, "cohort_start", off.alias("offset"), "v")
        .groupBy("cohort_start", "offset")
        .agg(
            F.countDistinct(key).cast("long").alias("n_active"),
            F.round(F.sum("v"), 6).alias("bucket_value"),
        )
    )
    size = cell.where(F.col("offset") == 0).select(
        "cohort_start", F.col("n_active").alias("cohort_size")
    )
    w = Window.partitionBy("cohort_start").orderBy("offset").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        cell.join(F.broadcast(size), "cohort_start")
        .select(
            _bucket_out(F.col("cohort_start"), bucket).alias("cohort_start"),
            "offset",
            "n_active",
            "bucket_value",
            F.round(F.sum("bucket_value").over(w), 6).alias("cum_value"),
            F.round(
                F.sum("bucket_value").over(w) / F.col("cohort_size"), 6
            ).alias("cum_value_per_user"),
        )
    )


def kaplan_meier(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    churn_gap_days: int = 7,
) -> DataFrame:
    """Kaplan–Meier survival curve over per-actor activity lifetimes.

    Lifetime of an actor = whole days between their first and last
    event.  An actor whose last event falls within ``churn_gap_days``
    of the corpus horizon (global max ts) is right-CENSORED — we have
    not yet observed their churn, so they leave the risk set without
    counting as a death, exactly the classic estimator:

        S(t) = Π_{t_i ≤ t, death times} (1 − d_i / n_i)

    with n_i = actors still at risk entering t_i (duration ≥ t_i) and
    d_i = observed churns at t_i.  Returns one row per distinct
    lifetime (t_days, n_risk, n_death, n_censor, survival).

    Scale shape: one groupBy(key) (the only actor-cardinality shuffle),
    one tiny groupBy(duration) — distinct whole-day lifetimes are
    bounded by the corpus span, never by actors — and the running
    product over that small table as exp(Σ log), a single-partition
    window over at most a few thousand rows.
    """
    horizon = df.agg(F.max(ts_col).alias("h"))
    per = (
        df.groupBy(key)
        .agg(F.min(ts_col).alias("first_ts"), F.max(ts_col).alias("last_ts"))
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff(F.col("last_ts"), F.col("first_ts")).cast("long").alias("t_days"),
            (
                F.datediff(F.col("h"), F.col("last_ts")) >= F.lit(churn_gap_days)
            ).alias("is_death"),
        )
    )
    cell = per.groupBy("t_days").agg(
        F.sum(F.col("is_death").cast("long")).alias("n_death"),
        F.sum((~F.col("is_death")).cast("long")).alias("n_censor"),
    )
    w = Window.orderBy("t_days")
    # risk set entering t = everyone whose lifetime is >= t: total minus
    # all actors who exited strictly before t (running sum shifted by 1)
    exited = F.coalesce(
        F.sum(F.col("n_death") + F.col("n_censor")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    total = F.sum(F.col("n_death") + F.col("n_censor")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cell = cell.withColumn("n_risk", (total - exited).cast("long"))
    # running product via exp(Σ log); a factor of exactly 0 (everyone at
    # risk dies at t) zeroes the curve from t onward
    factor = F.lit(1.0) - F.col("n_death") / F.col("n_risk")
    logf = F.when(factor > 0, F.log(factor))
    dead = F.max((factor <= 0).cast("int")).over(w.rowsBetween(Window.unboundedPreceding, 0))
    surv = F.when(dead == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(logf).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return cell.select(
        "t_days", "n_risk", "n_death", "n_censor", F.round(surv, 6).alias("survival")
    )


def ab_test(
    df: DataFrame,
    key: str = "user_id",
    conversion_type: str = "purchase",
    type_col: str = "event_type",
    value_col: str = "value",
    min_conversions: int = 1,
) -> DataFrame:
    """Deterministic A/B experiment readout with a two-proportion z-test.

    Assigns every actor to variant A/B by md5 parity of the key — the
    standard hash-bucket assignment, portable bit-for-bit to any SQL
    engine (unlike xxhash64 seeds) so the oracle reproduces the split
    exactly.  Conversion = the actor emitted ≥ ``min_conversions``
    ``conversion_type`` events.  Returns ONE row: per-variant exposure and conversion
    counts/rates, per-converting-actor mean value, absolute lift, and
    the pooled two-proportion z statistic

        z = (p_b − p_a) / sqrt( p̂(1−p̂) (1/n_a + 1/n_b) )

    Scale shape: one groupBy(key) shuffle, then a single-row final
    aggregate — no window, no join, no actor-cardinality state on the
    driver.
    """
    # parity of the last md5 hex digit — an IN-list over odd hex digits
    # evaluates identically in every SQL dialect (no base-conversion
    # builtins needed on the oracle side)
    variant = (
        F.substring(F.md5(F.col(key).cast("string")), 32, 1)
        .isin("1", "3", "5", "7", "9", "b", "d", "f")
        .cast("int")
    )
    per = df.groupBy(key).agg(
        (
            F.sum(
                F.when(F.col(type_col) == conversion_type, 1).otherwise(0)
            ) >= F.lit(min_conversions)
        ).cast("int").alias("converted"),
        F.sum(
            F.when(F.col(type_col) == conversion_type, F.col(value_col)).otherwise(0.0)
        ).alias("conv_value"),
    ).select(variant.alias("variant"), "converted", "conv_value")
    g = per.groupBy().pivot("variant", [0, 1]).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").alias("c"),
        F.round(F.sum(F.when(F.col("converted") == 1, F.col("conv_value"))), 6).alias("v"),
    )
    n_a, c_a = F.col("0_n").cast("long"), F.col("0_c").cast("long")
    n_b, c_b = F.col("1_n").cast("long"), F.col("1_c").cast("long")
    p_a, p_b = c_a / n_a, c_b / n_b
    pool = (c_a + c_b) / (n_a + n_b)
    denom = F.sqrt(pool * (1 - pool) * (1 / n_a + 1 / n_b))
    # degenerate experiments (0% or 100% pooled conversion) have no
    # defined z — emit NULL rather than tripping ANSI divide-by-zero
    z = F.when(denom > 0, (p_b - p_a) / denom)
    return g.select(
        n_a.alias("n_a"), n_b.alias("n_b"),
        c_a.alias("conv_a"), c_b.alias("conv_b"),
        F.round(p_a, 6).alias("rate_a"), F.round(p_b, 6).alias("rate_b"),
        F.round(F.col("0_v") / F.nullif(c_a, F.lit(0)), 6).alias("value_per_conv_a"),
        F.round(F.col("1_v") / F.nullif(c_b, F.lit(0)), 6).alias("value_per_conv_b"),
        F.round(p_b - p_a, 6).alias("lift_abs"),
        F.round(z, 6).alias("z_score"),
    )


def changepoint(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "day",
) -> DataFrame:
    """Single most-likely changepoint per series (AMOC binary
    segmentation): for every split point t of the per-bucket count
    series, score the CUSUM-type statistic

        G(t) = |mean(x₁..t) − mean(x_{t+1}..T)| · sqrt(t(T−t)/T)

    and report the argmax — the standard first step of binary
    segmentation / the offline twin of the streaming anomaly detector.
    Returns one row per group: (group, t_star, stat, mean_before,
    mean_after, n_buckets), t_star = last bucket of the left segment.
    Ties break to the earliest split.

    Scale shape: one (group, bucket) hash aggregate — the only
    data-proportional stage — then every window runs over per-group
    BUCKET series (bounded by the corpus span, never by events);
    argmax is one more bounded window, no self-join over splits.
    """
    cnt = (
        df.groupBy(F.col(group_col).alias("g"), F.date_trunc(bucket, F.col(ts_col)).alias("b"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    w = Window.partitionBy("g").orderBy("b")
    run = cnt.select(
        "g", "b", "x",
        F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("s"),
        F.row_number().over(w).alias("t"),
        F.sum("x").over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).alias("tot"),
        F.count(F.lit(1)).over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).alias("n"),
    ).where(F.col("t") < F.col("n"))
    mb = F.col("s") / F.col("t")
    ma = (F.col("tot") - F.col("s")) / (F.col("n") - F.col("t"))
    g_stat = F.abs(mb - ma) * F.sqrt(F.col("t") * (F.col("n") - F.col("t")) / F.col("n"))
    scored = run.select(
        "g", "b", "n",
        F.round(g_stat, 6).alias("stat"),
        F.round(mb, 6).alias("mean_before"),
        F.round(ma, 6).alias("mean_after"),
    )
    ww = Window.partitionBy("g").orderBy(F.col("stat").desc(), F.col("b").asc())
    return (
        scored.withColumn("rk", F.row_number().over(ww))
        .where(F.col("rk") == 1)
        .select(
            F.col("g").alias(group_col),
            _bucket_out(F.col("b"), bucket).alias("t_star"),
            "stat",
            "mean_before",
            "mean_after",
            F.col("n").cast("long").alias("n_buckets"),
        )
    )


def funnel_latency(
    df: DataFrame,
    steps: list[str],
    key: str = "user_id",
    ts_col: str = "ts",
    label: str = "event_type",
    horizon_s: float | None = None,
) -> DataFrame:
    """Per-step conversion-latency profile for the ordered funnel — the
    "how long did step k take" companion of :func:`funnel` (identical
    first-match / strictly-after / horizon semantics, so the two
    reports never disagree on who converted).  For each step k ≥ 2,
    reports the distribution of ``t_k − t_{k-1}`` over converting keys:
    (step_idx, step, n_keys, mean_s, p50_s, p90_s); step 1 rows carry
    NULL latencies (nothing precedes the entry step).

    Scale shape: same k sequential equi-join + min-aggregate passes as
    funnel; latency stats are one extra 1-row aggregate per step (exact
    percentile over converting keys — bounded by funnel survivors).
    """
    if len(steps) < 1:
        raise ValueError("at least one funnel step required")
    ev = df.select(key, ts_col, label).where(F.col(label).isin(list(steps)))
    ep = lambda c: F.unix_micros(F.col(c).cast("timestamp")) / 1e6  # noqa: E731
    cur = (
        ev.where(F.col(label) == steps[0])
        .groupBy(key)
        .agg(F.min(ts_col).alias("t"))
        .withColumn("t0", F.col("t"))
        .localCheckpoint(eager=True)
    )
    out_rows = [
        cur.agg(F.count(F.lit(1)).alias("n_keys")).select(
            F.lit(1).alias("step_idx"), F.lit(steps[0]).alias("step"), "n_keys",
            F.lit(None).cast("double").alias("mean_s"),
            F.lit(None).cast("double").alias("p50_s"),
            F.lit(None).cast("double").alias("p90_s"),
        )
    ]
    for k, name in enumerate(steps[1:], start=2):
        nxt = ev.where(F.col(label) == name).join(
            cur.select(key, F.col("t").alias("tprev"), "t0"), key
        ).where(F.col(ts_col) > F.col("tprev"))
        if horizon_s is not None:
            nxt = nxt.where(ep(ts_col) <= ep("t0") + float(horizon_s))
        cur = (
            nxt.groupBy(key)
            .agg(
                F.min(ts_col).alias("t"),
                F.min("tprev").alias("tprev"),
                F.min("t0").alias("t0"),
            )
            .localCheckpoint(eager=True)
        )
        lag = ep("t") - ep("tprev")
        out_rows.append(
            cur.agg(
                F.count(F.lit(1)).alias("n_keys"),
                F.round(F.avg(lag), 6).alias("mean_s"),
                F.round(F.percentile(lag, F.lit(0.5)), 6).alias("p50_s"),
                F.round(F.percentile(lag, F.lit(0.9)), 6).alias("p90_s"),
            ).select(
                F.lit(k).alias("step_idx"), F.lit(name).alias("step"),
                "n_keys", "mean_s", "p50_s", "p90_s",
            )
        )
    res = out_rows[0]
    for r in out_rows[1:]:
        res = res.unionByName(r)
    return res


def stickiness(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """DAU/WAU stickiness per day — the engagement ratio every product
    dashboard tracks: of the actors active in the trailing
    ``window_days`` window ending at day d, what fraction was active ON
    day d?  Returns (day, dau, wau, stickiness), days ordered.

    Scale shape: one distinct (actor, day) projection (hash aggregate),
    then the trailing-window distinct count expands each actor-day into
    ≤ window_days (day, actor) rows via a bounded ``sequence`` explode —
    state bounded by active-pairs × window, never actors × days — and
    two small hash aggregates.
    """
    ad = df.select(key, F.date_trunc("day", F.col(ts_col)).alias("day")).distinct()
    days = ad.select("day").distinct()
    dau = ad.groupBy("day").agg(F.countDistinct(key).cast("long").alias("dau"))
    # every (actor, day) contributes to the WAU of days day..day+w-1;
    # explode that bounded range and count distinct actors per target day
    fan = ad.select(
        key,
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr(f"INTERVAL {int(window_days) - 1} DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    wau = (
        fan.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct(key).cast("long").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            "day", "dau", "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )


def seasonal_naive_error(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    season_days: int = 7,
) -> DataFrame:
    """Seasonal-naive forecast baseline error per series: predict each
    day's count with the count ``season_days`` earlier and report MAE /
    RMSE / MAPE over the evaluable days — the floor every real
    forecasting model must beat, and the cheapest drift alarm when the
    error suddenly doubles.  Returns (group, n_days, mae, rmse, mape).

    Scale shape: one (group, day) count aggregate, one per-group lag
    window over the bounded day series, one final hash aggregate.
    """
    cnt = (
        df.groupBy(F.col(group_col).alias("g"), F.date_trunc("day", F.col(ts_col)).alias("d"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    w = Window.partitionBy("g").orderBy("d")
    lagged = cnt.withColumn("pred", F.lag("x", season_days).over(w)).where(
        F.col("pred").isNotNull()
    )
    err = F.col("x") - F.col("pred")
    return (
        lagged.groupBy(F.col("g").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(F.avg(F.abs(err)), 6).alias("mae"),
            F.round(F.sqrt(F.avg(err * err)), 6).alias("rmse"),
            F.round(F.avg(F.abs(err) / F.col("x")), 6).alias("mape"),
        )
    )


def type_affinity(
    df: DataFrame,
    key: str = "user_id",
    label: str = "event_type",
) -> DataFrame:
    """Actor–label affinity lift: P(label | actor) / P(label) — the
    specialization matrix (lift ≫ 1: the actor concentrates on that
    label; ≪ 1: avoids it).  The same statistic as PMI's exp form,
    over actors instead of token windows.  Returns
    (key, label, n, lift) per observed pair.

    Scale shape: two associative hash aggregates (pair counts, actor
    totals) + one broadcast label-marginal join — |actors|·|labels|
    output bound, never a self-join.
    """
    pair = df.groupBy(key, label).agg(F.count(F.lit(1)).alias("n"))
    per_k = pair.groupBy(key).agg(F.sum("n").alias("nk"))
    per_l = pair.groupBy(label).agg(F.sum("n").alias("nl"))
    tot = pair.agg(F.sum("n").alias("nt"))
    return (
        pair.join(per_k, key)
        .join(F.broadcast(per_l), label)
        .crossJoin(F.broadcast(tot))
        .select(
            key, label,
            F.col("n").cast("long").alias("n"),
            F.round(
                (F.col("n") / F.col("nk")) / (F.col("nl") / F.col("nt")), 6
            ).alias("lift"),
        )
    )


def markov_accuracy(
    df: DataFrame,
    key: str = "user_id",
    label: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Top-1 Markov next-event baseline: predict each transition's next
    label with the corpus-wide argmax of P(next | current) and report
    per-current-label accuracy — the floor any sequence model must
    beat, and the quickest "is there signal in event order at all"
    check.  (In-sample by design: it's a baseline, not a model eval.)
    Returns (label, n_transitions, top_next, accuracy).

    Scale shape: one per-key lead window (the sessionize exchange), one
    (cur, next) hash aggregate, an argmax over the |labels|² matrix,
    and one broadcast join back — nothing beyond the first window
    touches raw events.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(tiebreak).asc())
    trans = (
        df.select(key, F.col(label).alias("cur"), F.lead(label).over(w).alias("nxt"))
        .where(F.col("nxt").isNotNull())
    )
    mat = trans.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("c"))
    wa = Window.partitionBy("cur").orderBy(F.col("c").desc(), F.col("nxt").asc())
    top = (
        mat.withColumn("rk", F.row_number().over(wa))
        .where(F.col("rk") == 1)
        .select("cur", F.col("nxt").alias("top_next"))
    )
    return (
        trans.join(F.broadcast(top), "cur")
        .groupBy(F.col("cur").alias(label))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_transitions"),
            F.min("top_next").alias("top_next"),
            F.round(
                F.avg((F.col("nxt") == F.col("top_next")).cast("double")), 6
            ).alias("accuracy"),
        )
    )


def slo_burn(
    df: DataFrame,
    error_type: str = "error",
    slo: float = 0.2,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily error-budget burn against an SLO target: per day the error
    fraction, its excess over the budget, and the RUNNING burn
    Σ(error_rate − slo) — positive and rising means the budget is being
    spent faster than it accrues, the page-someone signal.  Returns
    (day, n, n_errors, error_rate, cum_burn).

    Scale shape: one (day) hash aggregate over the stream; the running
    window is over the bounded day series.
    """
    cnt = df.groupBy(F.date_trunc("day", F.col(ts_col)).alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col(type_col) == error_type).cast("long")).alias("n_errors"),
    )
    rate = F.col("n_errors") / F.col("n")
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return cnt.select(
        "day", "n", "n_errors",
        F.round(rate, 6).alias("error_rate"),
        F.round(F.sum(rate - F.lit(float(slo))).over(w), 6).alias("cum_burn"),
    )


def actor_behavior_kl(
    df: DataFrame,
    key: str = "user_id",
    label: str = "event_type",
) -> DataFrame:
    """Per-actor behavioural outlier score: KL divergence from the
    actor's own label distribution to the corpus-wide distribution —
    the events twin of textops.doc_source_kl (bots, scripted accounts
    and scrapers all concentrate probability mass the population
    spreads out).  Exact and finite (actor support ⊆ corpus support).
    Returns (key, n_events, kl).

    Scale shape: two associative hash aggregates + one broadcast
    |labels|-row marginal join.
    """
    pair = df.groupBy(key, label).agg(F.count(F.lit(1)).alias("c"))
    per_k = pair.groupBy(key).agg(F.sum("c").alias("nk"))
    marg = pair.groupBy(label).agg(F.sum("c").alias("nl"))
    tot = pair.agg(F.sum("c").alias("nt"))
    p = F.col("c") / F.col("nk")
    q = F.col("nl") / F.col("nt")
    return (
        pair.join(per_k, key)
        .join(F.broadcast(marg), label)
        .crossJoin(F.broadcast(tot))
        .groupBy(key)
        .agg(
            F.sum("c").cast("long").alias("n_events"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl"),
        )
    )


def hurst_variance(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    scales_hours: tuple = (1, 2, 4, 8),
) -> DataFrame:
    """Variance-time self-similarity estimate per series (the classic
    Leland et al. long-range-dependence check): aggregate counts at
    several time scales, regress log(var of per-bucket counts
    NORMALISED to rate per base hour) on log(scale); slope β gives the
    Hurst exponent H = 1 + β/2.  H ≈ 0.5 ⇒ Poisson-like; H → 1 ⇒
    long-range-dependent (bursts at every scale — the traffic that
    breaks naive capacity planning).  Returns (group, slope, hurst,
    n_scales).

    Scale shape: one (group, bucket) hash aggregate per scale (the
    bucket is a pure column expression), variances over the bounded
    bucket series, and an |groups|·|scales|-row closed-form regression.
    """
    outs = None
    base = float(scales_hours[0])
    for h in scales_hours:
        b = F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / (3600e6 * h))
        cnt = df.groupBy(F.col(group_col).alias("g"), b.alias("bk")).agg(
            F.count(F.lit(1)).alias("x")
        )
        v = cnt.groupBy("g").agg(
            F.var_samp(F.col("x") / F.lit(h / base)).alias("v"),
            F.lit(float(h)).alias("scale"),
        )
        outs = v if outs is None else outs.unionByName(v)
    pts = outs.where(F.col("v") > 0).select(
        "g", F.log("scale").alias("lx"), F.log("v").alias("ly")
    )
    reg = pts.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("lx").alias("mx"), F.avg("ly").alias("my"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    )
    slope = (F.col("sxy") - F.col("n") * F.col("mx") * F.col("my")) / (
        F.col("sxx") - F.col("n") * F.col("mx") * F.col("mx")
    )
    return reg.select(
        F.col("g").alias(group_col),
        F.round(slope, 6).alias("slope"),
        F.round(F.lit(1.0) + slope / 2.0, 6).alias("hurst"),
        F.col("n").cast("long").alias("n_scales"),
    )


def benford_test(
    df: DataFrame,
    value_col: str = "value",
    group_col: str | None = None,
) -> DataFrame:
    """Benford first-digit audit of a value column — the forensic
    data-quality check: organically-generated magnitudes follow
    P(d) = log10(1 + 1/d); fabricated, clipped or unit-mixed values
    don't.  Reports per first digit the observed share, Benford's
    expectation, and the χ² contribution; Σ of the last column is the
    test statistic (8 dof).  Rows with value ≤ 0 are excluded (Benford
    applies to positive magnitudes).  Returns
    (digit, n, observed, expected, chi2_term).

    Scale shape: first digit is a pure column expression
    (floor(v / 10^floor(log10 v))), then ONE 9-row hash aggregate.
    """
    v = F.col(value_col).cast("double")
    digit = F.floor(v / F.pow(F.lit(10.0), F.floor(F.log10(v)))).cast("int")
    pos = df.where(v > 0).select(digit.alias("digit"))
    cell = pos.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = cell.agg(F.sum("n").alias("nt"))
    exp = F.log10(1.0 + 1.0 / F.col("digit"))
    obs = F.col("n") / F.col("nt")
    return (
        cell.crossJoin(F.broadcast(tot))
        .select(
            F.col("digit").cast("long").alias("digit"),
            F.col("n").cast("long").alias("n"),
            F.round(obs, 6).alias("observed"),
            F.round(exp, 6).alias("expected"),
            F.round(
                F.col("nt") * (obs - exp) * (obs - exp) / exp, 6
            ).alias("chi2_term"),
        )
    )


def activity_correlation(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-over-day actor-rank stability: Pearson correlation of
    per-actor event counts between consecutive days, over actors active
    on BOTH days — near 1 means the same actors dominate every day
    (stable workload / possible bot core), near 0 means churning
    attention.  Returns (day, next_day, n_both, r).

    Scale shape: one (actor, day) count aggregate, a self-join keyed on
    (actor, day+1) — bounded by active actor-days, not events — and a
    per-day-pair closed-form correlation aggregate.
    """
    cnt = df.groupBy(
        key, F.date_trunc("day", F.col(ts_col)).alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    nxt = cnt.select(
        key,
        (F.col("day") - F.expr("INTERVAL 1 DAY")).alias("day"),
        F.col("x").alias("y"),
    )
    j = cnt.join(nxt, [key, "day"])
    agg = j.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_both"),
        F.avg("x").alias("mx"), F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
        F.avg(F.col("y") * F.col("y")).alias("myy"),
    )
    cov = F.col("mxy") - F.col("mx") * F.col("my")
    vx = F.col("mxx") - F.col("mx") * F.col("mx")
    vy = F.col("myy") - F.col("my") * F.col("my")
    # midnight timestamps, not DATE: both engines then surface the column
    # as datetime64 (the peak_days convention), so driver value-compares
    # agree byte-for-byte
    return agg.select(
        "day",
        (F.col("day") + F.expr("INTERVAL 1 DAY")).alias("next_day"),
        "n_both",
        F.round(F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)), 6).alias("r"),
    )


def peak_days(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    factor: float = 1.5,
    window_days: int = 7,
) -> DataFrame:
    """Peak detection against a trailing-median baseline: a day is a
    peak when its count exceeds ``factor`` × the median of the previous
    ``window_days`` days — the robust (outlier-immune) cousin of the
    z-score anomaly flag.  Days without a full trailing window are
    unscored (NULL baseline).  Returns (group, day, n, baseline,
    is_peak).

    Scale shape: one (group, day) hash aggregate; the rolling median is
    an exact window aggregate over the bounded per-group day series.
    """
    cnt = df.groupBy(
        F.col(group_col).alias("g"), F.date_trunc("day", F.col(ts_col)).alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    w = Window.partitionBy("g").orderBy("day").rowsBetween(-window_days, -1)
    # median via sorted frame collect: Spark's median/percentile
    # aggregates reject window frames, but collect_list accepts them and
    # the frame is bounded (<= window_days rows) by construction
    arr = F.array_sort(F.collect_list("n").over(w))
    mid = F.element_at(arr, int(window_days) // 2 + 1)
    base = F.when(
        F.size(arr) >= window_days,
        F.when(
            F.lit(window_days % 2 == 1), mid
        ).otherwise((F.element_at(arr, int(window_days) // 2) + mid) / 2.0),
    )
    return cnt.select(
        F.col("g").alias(group_col),
        "day",
        F.col("n").cast("long").alias("n"),
        F.round(base, 6).alias("baseline"),
        # FALSE (not NULL) when unscored: a day without a full trailing
        # window can never be claimed a peak, and NULL booleans stringify
        # differently across engines in the comparison harness
        F.coalesce(
            F.col("n") > F.lit(float(factor)) * base, F.lit(False)
        ).alias("is_peak"),
    )


def wilson_error_rates(
    df: DataFrame,
    key: str = "user_id",
    error_type: str = "error",
    type_col: str = "event_type",
    z: float = 1.96,
) -> DataFrame:
    """Per-actor error rate with a Wilson score interval and an
    elevated-vs-population flag: the actor is flagged iff the interval's
    LOWER bound clears the global error rate — the small-sample-honest
    version of "error rate above average" (a 1-for-1 actor never flags;
    a 40-for-50 actor does).  Returns (key, n, n_errors, rate,
    wilson_low, wilson_high, is_elevated).

    Scale shape: one groupBy(actor) + a broadcast 1-row global rate;
    the interval is pure column arithmetic.
    """
    per = df.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col(type_col) == error_type).cast("long")).alias("n_errors"),
    )
    glob = df.agg(
        (
            F.sum((F.col(type_col) == error_type).cast("long")) / F.count(F.lit(1))
        ).alias("g")
    )
    p = F.col("n_errors") / F.col("n")
    z2 = float(z) * float(z)
    denom = 1.0 + z2 / F.col("n")
    center = (p + z2 / (2 * F.col("n"))) / denom
    half = (
        F.lit(float(z))
        * F.sqrt(p * (1 - p) / F.col("n") + z2 / (4 * F.col("n") * F.col("n")))
        / denom
    )
    return (
        per.crossJoin(F.broadcast(glob))
        .select(
            key, "n", "n_errors",
            F.round(p, 6).alias("rate"),
            F.round(center - half, 6).alias("wilson_low"),
            F.round(center + half, 6).alias("wilson_high"),
            (F.round(center - half, 6) > F.col("g")).alias("is_elevated"),
        )
    )


def hhi_concentration(
    df: DataFrame,
    group_col: str = "event_type",
    key: str = "user_id",
) -> DataFrame:
    """Herfindahl–Hirschman concentration of activity per label: Σ over
    actors of their squared share of the label's events — 1/n_actors
    for perfectly spread activity, → 1 when one actor dominates (the
    single-scalar "is this event type one bot?" check).  Also reports
    the effective actor count 1/HHI.  Returns
    (group, n_actors, n_events, hhi, effective_actors).

    Scale shape: one (label, actor) hash aggregate, one per-label
    rollup — both map-side combinable.
    """
    cell = df.groupBy(F.col(group_col).alias("g"), F.col(key)).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = cell.groupBy("g").agg(F.sum("c").alias("n"))
    hhi = F.sum((F.col("c") / F.col("n")) * (F.col("c") / F.col("n")))
    return (
        cell.join(F.broadcast(tot), "g")
        .groupBy(F.col("g").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_actors"),
            F.max("n").cast("long").alias("n_events"),
            F.round(hhi, 6).alias("hhi"),
            F.round(1.0 / hhi, 6).alias("effective_actors"),
        )
    )


def activity_heatmap(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Weekday × hour activity heatmap: counts and corpus share per
    (dow, hour) cell — the load-shape table behind every capacity /
    on-call staffing chart, and the quickest tz-misconfiguration
    detector (a "nocturnal" corpus usually means wrong timezone).
    dow is 0=Sunday..6=Saturday.  Returns (dow, hour, n, share).

    Scale shape: one 168-cell hash aggregate; the share divides by a
    broadcast 1-row total.
    """
    cell = df.groupBy(
        (F.dayofweek(F.col(ts_col)) - 1).cast("int").alias("dow"),
        F.hour(F.col(ts_col)).cast("int").alias("hour"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = cell.agg(F.sum("n").alias("nt"))
    return cell.crossJoin(F.broadcast(tot)).select(
        "dow", "hour", "n", F.round(F.col("n") / F.col("nt"), 6).alias("share")
    )


def calibration_curve(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    bins: int = 10,
) -> DataFrame:
    """Reliability curve for a probabilistic scorer (the quality-filter /
    toxicity / dedup-confidence models a training pipeline gates on):
    bucket predictions into ``bins`` equal-width score bins over [0, 1]
    and report, per bin, the count, mean predicted score, and observed
    positive rate — plus the bin's |gap|, whose count-weighted average is
    the Expected Calibration Error (Guo et al. 2017).  A well-calibrated
    filter has pos_rate ~ mean_score in every bin; systematic gaps mean
    the gating threshold does not mean what it says.

    Returns (bin, n, mean_score, pos_rate, abs_gap), bin = 0..bins-1;
    ECE = sum(n * abs_gap) / sum(n) downstream.

    Scale shape: one projection + one ``bins``-ary hash aggregate
    (map-side combinable); no windows, no joins.
    """
    b = F.least(
        F.floor(F.col(score_col) * bins).cast("int"), F.lit(int(bins) - 1)
    )
    b = F.greatest(b, F.lit(0))
    agg = (
        df.select(
            b.alias("bin"),
            F.col(score_col).alias("s"),
            F.col(label_col).cast("double").alias("y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.avg("s").alias("ms"),
            F.avg("y").alias("pr"),
        )
    )
    return agg.select(
        "bin", "n",
        F.round(F.col("ms"), 6).alias("mean_score"),
        F.round(F.col("pr"), 6).alias("pos_rate"),
        F.round(F.abs(F.col("ms") - F.col("pr")), 6).alias("abs_gap"),
    )


def temporal_motifs(
    df: DataFrame,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    delta_s: int = 3600,
) -> DataFrame:
    """delta-windowed temporal 3-event motif census (Paranjape, Benson &
    Leskovec, "Motifs in Temporal Networks", WSDM 2017 — the
    consecutive-event specialisation): count, per ordered type triple
    (a, b, c), the occurrences of three CONSECUTIVE events of one actor
    whose total span fits in ``delta_s`` seconds.  The temporal
    fingerprint of behaviour: `view->click->purchase` vs
    `error->error->error` populate different cells, and motif-histogram
    shifts catch behavioural drift that per-pair transition matrices
    (first-order Markov) miss.

    Returns (a, b, c, n), n = motif occurrences corpus-wide.

    Scale shape: ONE hash exchange on the actor + a sorted per-actor
    window (two leads — sorted runs, no self-joins over the time axis),
    then a |types|³-bounded hash aggregate.  Ordering ties break on the
    event id, so the census is deterministic and engine-portable.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    seq = df.select(
        F.col(type_col).alias("a"),
        F.lead(type_col, 1).over(w).alias("b"),
        F.lead(type_col, 2).over(w).alias("c"),
        F.col(ts_col).cast("timestamp").alias("t0"),
        F.lead(F.col(ts_col).cast("timestamp"), 2).over(w).alias("t2"),
    )
    span_ok = (
        (F.unix_micros(F.col("t2")) - F.unix_micros(F.col("t0")))
        <= F.lit(int(delta_s) * 1_000_000)
    )
    return (
        seq.where(F.col("c").isNotNull() & span_ok)
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def interarrival_ks(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    min_gaps: int = 5,
) -> DataFrame:
    """Per-actor Kolmogorov–Smirnov distance between the empirical
    inter-event-gap distribution and the exponential fit with the same
    mean — the distributional sibling of :func:`burstiness`: B compresses
    the gap shape into one moment ratio, the KS statistic says how far
    the whole CDF is from memoryless Poisson arrivals (bots and schedules
    score high, organic activity low).

        D = max_i max(i/n − F(g_(i)),  F(g_(i)) − (i−1)/n),
        F(x) = 1 − exp(−x / mean_gap)

    over the actor's sorted gaps g_(1..n).  Actors with fewer than
    ``min_gaps`` gaps are dropped (the statistic is meaningless on 2
    points).  Returns (``id_col``, n_gaps, mean_gap_s, ks_stat).

    Scale shape: gaps via one per-actor lag window (partition-bounded by
    actor event counts), the mean joins back as a per-actor aggregate,
    the CDF ranks are a second per-actor window — nothing global, no
    driver actions, output = |actors| rows.
    """
    ep = F.unix_micros(F.col(ts_col).cast("timestamp")) / 1e6
    w = Window.partitionBy(id_col).orderBy("t")
    gaps = (
        events.select(id_col, ep.alias("t"))
        .withColumn("gap", F.col("t") - F.lag("t").over(w))
        .where(F.col("gap").isNotNull())
        .select(id_col, "gap")
    )
    stats = gaps.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_gaps"), F.avg("gap").alias("mean_gap"),
    ).where(F.col("n_gaps") >= int(min_gaps))
    wr = Window.partitionBy(id_col).orderBy("gap", "rid")
    ranked = (
        gaps.withColumn("rid", F.monotonically_increasing_id())
        .join(stats, id_col)
        .withColumn("i", F.row_number().over(wr))
    )
    fexp = F.when(
        F.col("mean_gap") > 0, 1.0 - F.exp(-F.col("gap") / F.col("mean_gap"))
    ).otherwise(F.lit(1.0))
    dev = F.greatest(
        F.col("i") / F.col("n_gaps") - fexp,
        fexp - (F.col("i") - 1) / F.col("n_gaps"),
    )
    return (
        ranked.groupBy(id_col)
        .agg(
            F.first("n_gaps").alias("n_gaps"),
            F.round(F.first("mean_gap"), 6).alias("mean_gap_s"),
            F.round(F.max(dev), 6).alias("ks_stat"),
        )
    )


def leadlag_correlation(
    df: DataFrame,
    label_col: str = "event_type",
    ts_col: str = "ts",
    max_lag: int = 3,
    bucket: str = "day",
) -> DataFrame:
    """Lead–lag cross-correlation between per-label activity series:
    for every ORDERED label pair (a, b) and lag 0..``max_lag``, the
    Pearson correlation of (count_a(t), count_b(t + lag)) over the full
    bucket grid — "does activity in a lead activity in b", the
    cross-series companion of :func:`activity_correlation` (which
    correlates actors day-over-day within one series).  Series are
    zero-filled over the corpus' [min, max] bucket span before
    correlating — a day with no events IS a zero observation, not a
    missing one.  Undefined correlations (a constant series in the
    overlap) are NULL.  Returns (label_a, label_b, lag, n_buckets, r).

    Scale shape: one (label, bucket) hash aggregate is the only
    event-proportional stage; the dense grid is |labels| × |buckets|
    (corpus-span bounded), the lag join is an equi-join on the shifted
    bucket, and the output is |labels|² · (max_lag+1) rows — catalog
    sized.  No windows over data, no driver loops.
    """
    secs = {"week": 604800, "day": 86400, "hour": 3600}[bucket]
    tb = F.date_trunc(bucket, F.col(ts_col))
    cnt = (
        df.groupBy(F.col(label_col).alias("lbl"), tb.alias("b"))
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    span = cnt.agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
    grid_b = span.select(
        F.explode(
            F.sequence(
                "lo", "hi",
                F.expr(f"INTERVAL {secs} SECONDS"),
            )
        ).alias("b")
    )
    labels = cnt.select("lbl").distinct()
    dense = (
        grid_b.crossJoin(F.broadcast(labels))
        .join(cnt, ["lbl", "b"], "left")
        .na.fill({"x": 0.0})
    )
    lag_rows = F.explode(F.array(*[F.lit(i) for i in range(max_lag + 1)])).alias("lag")
    a = dense.select(F.col("lbl").alias("label_a"), "b", F.col("x").alias("xa"))
    bshift = dense.select(
        F.col("lbl").alias("label_b"),
        F.col("b").alias("b_lead"),
        F.col("x").alias("xb"),
    )
    j = (
        a.select("label_a", "b", "xa", lag_rows)
        .withColumn("b_lead", F.col("b") + F.col("lag") * F.expr(f"INTERVAL {secs} SECONDS"))
        .join(bshift, "b_lead")
    )
    agg = j.groupBy("label_a", "label_b", "lag").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.avg("xa").alias("ma"), F.avg("xb").alias("mb"),
        F.avg(F.col("xa") * F.col("xb")).alias("mab"),
        F.avg(F.col("xa") * F.col("xa")).alias("maa"),
        F.avg(F.col("xb") * F.col("xb")).alias("mbb"),
    )
    cov = F.col("mab") - F.col("ma") * F.col("mb")
    va = F.col("maa") - F.col("ma") * F.col("ma")
    vb = F.col("mbb") - F.col("mb") * F.col("mb")
    return agg.select(
        "label_a", "label_b", F.col("lag").cast("long").alias("lag"), "n_buckets",
        F.round(F.when((va > 0) & (vb > 0), cov / F.sqrt(va * vb)), 6).alias("r"),
    )


def attribution(
    df: DataFrame,
    conversion_type: str,
    key: str = "user_id",
    ts_col: str = "ts",
    label_col: str = "event_type",
    window_s: float = 86400.0,
    model: str = "last",
) -> DataFrame:
    """Multi-touch conversion attribution: every ``conversion_type``
    event distributes one unit of credit over the SAME key's preceding
    non-conversion touchpoints within ``window_s`` seconds —

    - ``model='last'``: the most recent touch gets the unit,
    - ``model='first'``: the earliest in-window touch gets it,
    - ``model='linear'``: the unit splits 1/n over all in-window touches

    — the standard channel-credit triple.  Conversions with no in-window
    touch are reported under label NULL ("unattributed"), so
    Σ credit = #conversions for every model (a conservation law the
    tests assert).  Returns (label, n_conversions_touched, credit).

    Scale shape: touchpoints and conversions are two filtered scans; the
    pairing is one per-key equi-join bounded by the window predicate in
    plan (the per-key fan-out is the key's in-window touch count, not
    the corpus), the per-conversion rank/count is a conversion-keyed
    window, and the final rollup is a label hash aggregate.
    """
    if model not in ("last", "first", "linear"):
        raise ValueError(model)
    ep = lambda c: F.unix_micros(F.col(c).cast("timestamp")) / 1e6  # noqa: E731
    conv = (
        df.where(F.col(label_col) == conversion_type)
        .select(F.col(key).alias("k"), ep(ts_col).alias("ct"))
        .withColumn("cid", F.concat_ws(":", "k", F.col("ct").cast("string")))
        .distinct()
    )
    touch = (
        df.where(F.col(label_col) != conversion_type)
        .select(F.col(key).alias("k"), ep(ts_col).alias("tt"), F.col(label_col).alias("lbl"))
    )
    paired = conv.join(touch, "k").where(
        (F.col("tt") < F.col("ct")) & (F.col("tt") >= F.col("ct") - float(window_s))
    )
    w = Window.partitionBy("cid")
    if model == "linear":
        credit = F.lit(1.0) / F.count(F.lit(1)).over(w)
        scored = paired.select("cid", "lbl", credit.alias("credit"))
    else:
        # last: latest touch (ties → label asc); first: earliest touch
        ordc = [F.desc("tt"), F.asc("lbl")] if model == "last" else [F.asc("tt"), F.asc("lbl")]
        rn = F.row_number().over(Window.partitionBy("cid").orderBy(*ordc))
        scored = (
            paired.withColumn("rn", rn).where(F.col("rn") == 1)
            .select("cid", "lbl", F.lit(1.0).alias("credit"))
        )
    unattributed = (
        conv.join(paired.select("cid").distinct(), "cid", "left_anti")
        .select("cid", F.lit(None).cast("string").alias("lbl"), F.lit(1.0).alias("credit"))
    )
    return (
        scored.unionByName(unattributed)
        .groupBy(F.col("lbl").alias("label"))
        .agg(
            F.countDistinct("cid").alias("n_conversions_touched"),
            F.round(F.sum("credit"), 6).alias("credit"),
        )
    )


def population_stability(
    events: DataFrame,
    label_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Population stability index between the corpus' first and second
    time halves (split at the midpoint of [min ts, max ts]): per label,
    the share in each half and its PSI contribution
    (p₂ − p₁)·ln(p₂/p₁); one TOTAL row (label NULL) carries Σ — the
    ML-ops drift gauge (<0.1 stable, 0.1–0.25 drifting, >0.25 shifted)
    for "did the event mix change", the distribution-level complement of
    :func:`changepoint` (which localises WHEN one series jumped).
    Labels absent from a half get the standard ε = 1e-6 floor so the
    log stays finite.  Returns (label, p_first, p_second, psi).

    Scale shape: one (half, label) hash aggregate — the only
    event-proportional stage — then catalog-sized arithmetic; the
    midpoint rides a 1-row broadcast cross join.
    """
    ep = lambda c: F.unix_micros(c.cast("timestamp")) / 1e6  # noqa: E731
    span = events.agg(
        F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
    ).select(((ep(F.col("lo")) + ep(F.col("hi"))) / 2.0).alias("mid"))
    halved = events.crossJoin(F.broadcast(span)).select(
        F.col(label_col).alias("lbl"),
        (ep(F.col(ts_col)) >= F.col("mid")).cast("int").alias("half"),
    )
    cnt = halved.groupBy("lbl").agg(
        F.sum(1 - F.col("half")).alias("n1"), F.sum("half").alias("n2")
    )
    tot = cnt.agg(F.sum("n1").alias("t1"), F.sum("n2").alias("t2"))
    eps = 1e-6
    p1 = F.greatest(F.col("n1") / F.col("t1"), F.lit(eps))
    p2 = F.greatest(F.col("n2") / F.col("t2"), F.lit(eps))
    per = (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "lbl",
            F.round(F.col("n1") / F.col("t1"), 6).alias("p_first"),
            F.round(F.col("n2") / F.col("t2"), 6).alias("p_second"),
            F.round((p2 - p1) * F.log(p2 / p1), 6).alias("psi"),
        )
    )
    total = per.agg(
        F.lit(None).cast("string").alias("lbl"),
        F.round(F.sum("p_first"), 6).alias("p_first"),
        F.round(F.sum("p_second"), 6).alias("p_second"),
        F.round(F.sum("psi"), 6).alias("psi"),
    )
    return per.unionByName(total).select(
        F.col("lbl").alias(label_col), "p_first", "p_second", "psi"
    )


def heavy_user_share(
    events: DataFrame,
    key: str = "user_id",
    pcts: tuple = (0.01, 0.05, 0.10),
) -> DataFrame:
    """Whale-concentration profile: for each percentile p, the share of
    ALL events produced by the top-⌈p·n⌉ most-active actors (ranked by
    event count, id-tiebroken) — the "1% of users generate X% of load"
    number behind capacity planning, abuse triage, and the decision to
    salt a hub.  Returns one row per p: (pct, n_top_users, n_users,
    share).

    Scale shape: one key hash aggregate (the only event-proportional
    stage) + one rank window over |actors| rows + a |pcts|-row explode
    joined against the cumulative counts — never touches raw events
    twice.
    """
    cnt = events.groupBy(F.col(key).alias("k")).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("k"))
    ranked = cnt.select(
        "n",
        F.row_number().over(w).alias("rk"),
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    tot = ranked.agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("n").alias("n_events")
    )
    rows = [
        tot.select(F.lit(float(p)).alias("pct"), "n_users", "n_events") for p in pcts
    ]
    ps = rows[0]
    for r in rows[1:]:
        ps = ps.unionByName(r)
    ps = ps.withColumn("n_top_users", F.ceil(F.col("pct") * F.col("n_users")).cast("long"))
    return (
        ps.join(ranked, ps["n_top_users"] == ranked["rk"])
        .select(
            "pct", "n_top_users", "n_users",
            F.round(F.col("cum") / F.col("n_events"), 6).alias("share"),
        )
        .orderBy("pct")
    )


def markov_absorption(
    events: DataFrame,
    absorbing: list,
    key: str = "user_id",
    ts_col: str = "ts",
    label_col: str = "event_type",
    tiebreak: str | None = "event_id",
) -> DataFrame:
    """Absorption probabilities of the first-order event-type Markov
    chain: from each transient state, the probability of eventually
    reaching each absorbing state — ``absorbing`` labels (e.g.
    ``["purchase"]``) plus the implicit ``END`` state entered after a
    key's last event.  This is the fundamental-matrix answer
    B = (I − Q)⁻¹ R to "what fraction of journeys that touch state s
    eventually convert", the model-based generalisation of the funnel's
    observed rates (it credits multi-step indirect paths the funnel's
    fixed step order cannot).  Returns (state, absorbing_state,
    probability), rows for transient states only, probabilities summing
    to 1 per state.

    Scale shape: the DATA-side work is one per-key lag window + one
    (from, to) hash aggregate — the Markov-chain plan; the transition
    matrix is catalog-sized (|labels|²), so the linear solve runs on the
    driver in NumPy — the localcore convention for provably-tiny state,
    never a driver loop over DATA.
    """
    import numpy as np

    order = [ts_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    nxt = events.select(
        key, F.col(label_col).alias("s"),
        F.lead(label_col).over(w).alias("t"),
    ).select("s", F.coalesce("t", F.lit("END")).alias("t"))
    cnt = nxt.groupBy("s", "t").agg(F.count(F.lit(1)).alias("n")).collect()
    absorbing_set = set(map(str, absorbing)) | {"END"}
    states = sorted({r["s"] for r in cnt} - absorbing_set)
    targets = sorted(absorbing_set)
    si = {s: i for i, s in enumerate(states)}
    ti = {t: i for i, t in enumerate(targets)}
    n = len(states)
    Q = np.zeros((n, n))
    R = np.zeros((n, len(targets)))
    totals = np.zeros(n)
    for r in cnt:
        if r["s"] in si:
            totals[si[r["s"]]] += r["n"]
    for r in cnt:
        if r["s"] not in si:
            continue
        i = si[r["s"]]
        p = r["n"] / totals[i]
        if r["t"] in si:
            Q[i, si[r["t"]]] += p
        else:
            # transitions into absorbing labels OR into states that only
            # ever appear as targets (never as sources) — the latter are
            # terminal in the observed chain, fold them into END
            R[i, ti.get(r["t"], ti["END"])] += p
    B = np.linalg.solve(np.eye(n) - Q, R)
    spark = events.sparkSession
    rows = [
        (states[i], targets[j], round(float(B[i, j]), 6))
        for i in range(n) for j in range(len(targets))
    ]
    return spark.createDataFrame(
        rows, "state string, absorbing_state string, probability double"
    )


def adoption_curve(
    events: DataFrame,
    label: str,
    key: str = "user_id",
    ts_col: str = "ts",
    label_col: str = "event_type",
    min_weight: int = 3,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Social-contagion adoption curve (the Backstrom-et-al descriptive):
    probability of adopting ``label`` as a function of the number of
    already-adopting neighbours in the co-activity graph.  Exposure of
    an adopter = neighbours whose FIRST ``label`` event precedes their
    own (strictly); exposure of a non-adopter = adopter neighbours ever
    (they were exposed and still didn't).  Returns one row per exposure
    count: (exposure, n_users, n_adopters, adoption_rate) — a rising
    curve is the contagion signature (with the usual homophily caveat,
    which this operator reports, not resolves).

    Scale shape: the co-activity derivation (or a caller-supplied
    ``edges`` (src, dst, …) user graph), ONE first-adoption aggregate,
    two id-keyed joins to decorate each edge end with adoption times,
    one per-user exposure aggregate, one |exposures|-row rollup.
    """
    if edges is None:
        from .edges import events_to_coactivity_edges

        edges = events_to_coactivity_edges(events, min_weight=min_weight)
    sym = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionByName(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    adopts = (
        events.where(F.col(label_col) == label)
        .groupBy(F.col(key).alias("id"))
        .agg(F.min(ts_col).alias("at"))
    )
    verts = sym.select(F.col("u").alias("id")).distinct()
    dec = (
        sym.join(adopts.select(F.col("id").alias("u"), F.col("at").alias("at_u")), "u", "left")
        .join(adopts.select(F.col("id").alias("v"), F.col("at").alias("at_v")), "v", "left")
    )
    exposed = F.when(
        F.col("at_v").isNotNull()
        & (F.col("at_u").isNull() | (F.col("at_v") < F.col("at_u"))),
        1,
    ).otherwise(0)
    per_user = (
        dec.groupBy(F.col("u").alias("id"))
        .agg(F.sum(exposed).alias("exposure"), F.first("at_u").alias("at_u"))
    )
    full = verts.join(per_user, "id", "left").na.fill({"exposure": 0})
    return (
        full.groupBy("exposure")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.col("at_u").isNotNull().cast("long")).alias("n_adopters"),
        )
        .select(
            F.col("exposure").cast("long").alias("exposure"), "n_users", "n_adopters",
            F.round(F.col("n_adopters") / F.col("n_users"), 6).alias("adoption_rate"),
        )
        .orderBy("exposure")
    )
