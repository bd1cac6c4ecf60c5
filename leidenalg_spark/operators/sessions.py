"""Batch sessionization — the window-function twin of the streaming
stateful operator (streaming/stateful.py).

Gap-split sessions are the standard unit of work for transcript-scale
pipelines (a closed session = one unit of edge derivation / indexing /
re-clustering).  The batch form is two window passes over the same
partition key — no per-row Python, no shuffle beyond the single hash
exchange on the session key that both windows share:

1. ``lag(ts)`` within the key ordered by time → a 0/1 "new session"
   marker wherever the gap exceeds the threshold;
2. a running sum of the marker → the session ordinal;

then one hash aggregation per (key, ordinal).  Catalyst executes both
window functions in ONE Window physical operator (same partition/order
spec), so the plan is exchange → sort → window → partial agg → final
agg.  At 10^12 rows the exchange is the only data movement, and it is
keyed by the id column the source table is clustered by, so a bucketed
source skips it entirely.

The streaming twin (``applyInPandasWithState``) must agree with this
definition exactly — tests assert streaming output == this batch output
on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_s: float = 1800.0,
    tool_col: str | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """(key, session_ord, session_start, session_end, n_events[, n_tool_calls]).

    A new session starts wherever the time since the key's previous row
    exceeds ``gap_s`` seconds.  ``tool_col`` (transcripts) adds a
    non-null-count of that column per session; ``tiebreak`` stabilises
    the window order under duplicate timestamps (oracle determinism).
    """
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    # epoch seconds with microsecond precision; the cast to TIMESTAMP
    # first makes this work for both LTZ and NTZ sources (ANSI mode
    # forbids a direct TIMESTAMP_NTZ → DOUBLE cast), and only gap
    # DIFFERENCES are consumed, so the session-timezone offset cancels
    t = F.unix_micros(F.col(ts_col).cast("timestamp")) / 1e6
    prev = F.lag(t).over(w)
    marker = F.when(prev.isNull() | ((t - prev) > gap_s), 1).otherwise(0)
    sess = (
        df.withColumn("_new", marker)
        .withColumn("session_ord", F.sum("_new").over(w) - 1)
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
    ]
    if tool_col is not None:
        aggs.append(F.count(tool_col).cast("int").alias("n_tool_calls"))
    return (
        sess.groupBy(F.col(key), F.col("session_ord").cast("int").alias("session_ord"))
        .agg(*aggs)
    )


def association_rules(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    label: str = "event_type",
    gap_s: float = 1800.0,
    tiebreak: str | None = None,
    min_support_n: int = 2,
) -> DataFrame:
    """Market-basket association rules over gap-split sessions: baskets
    are (key, session), items the distinct ``label`` values within one
    basket.  Emits every ORDERED pair with joint count ≥
    ``min_support_n``: (antecedent, consequent, n_ab, support,
    confidence, lift) — support = n_ab/n_baskets, confidence =
    n_ab/n_antecedent, lift = confidence/(n_consequent/n_baskets).

    Scale shape: the session assignment is the sessionize window pass;
    items-per-basket is bounded by the label vocabulary, so the basket
    self-join is |baskets|·v² at worst — a bounded constant per basket,
    never corpus-quadratic; the three basket-count scalars ride
    broadcast joins.
    """
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    t = F.unix_micros(F.col(ts_col).cast("timestamp")) / 1e6
    prev = F.lag(t).over(w)
    marker = F.when(prev.isNull() | ((t - prev) > gap_s), 1).otherwise(0)
    items = (
        df.withColumn("_new", marker)
        .withColumn("session_ord", F.sum("_new").over(w) - 1)
        .select(key, "session_ord", F.col(label).alias("item"))
        .distinct()
    )
    n_baskets = items.select(key, "session_ord").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("nb")
    )
    n_item = items.groupBy("item").agg(F.count(F.lit(1)).alias("ni"))
    a = items.select(key, "session_ord", F.col("item").alias("antecedent"))
    b = items.select(key, "session_ord", F.col("item").alias("consequent"))
    pairs = (
        a.join(b, [key, "session_ord"])
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_support_n)
    )
    return (
        pairs.join(F.broadcast(n_item.select(F.col("item").alias("antecedent"),
                                             F.col("ni").alias("na"))), "antecedent")
        .join(F.broadcast(n_item.select(F.col("item").alias("consequent"),
                                        F.col("ni").alias("nc"))), "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent", "consequent", F.col("n_ab").cast("long").alias("n_ab"),
            F.round(F.col("n_ab") / F.col("nb"), 6).alias("support"),
            F.round(F.col("n_ab") / F.col("na"), 6).alias("confidence"),
            F.round((F.col("n_ab") / F.col("na")) / (F.col("nc") / F.col("nb")), 6).alias("lift"),
        )
    )


def conversation_profile(transcripts: DataFrame) -> DataFrame:
    """Per-conversation profile of an input_hint-shaped transcripts table
    ``(conv_id, turn_idx, role, text, tool, ts)`` — the first table an
    analyst builds over agent logs: turn counts by role, tool usage,
    text volume, wall-clock duration, and the role-alternation rate
    (fraction of consecutive turn pairs that switch speaker — low values
    flag degenerate single-speaker runs).

    ONE shuffle total: the ``lag(role)`` window hash-partitions on
    ``conv_id`` and the groupBy reuses that exchange (same key).  All
    expressions are JVM-side; output is |convs| rows.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    alt = F.when(
        F.lag("role").over(w).isNotNull()
        & (F.col("role") != F.lag("role").over(w)),
        1,
    ).otherwise(0)
    n_turns = F.count(F.lit(1))
    return (
        transcripts.withColumn("_alt", alt)
        .groupBy("conv_id")
        .agg(
            n_turns.cast("long").alias("n_turns"),
            F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
            .cast("long").alias("n_user_turns"),
            F.sum(F.when(F.col("tool").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_tool_calls"),
            F.countDistinct("tool").cast("long").alias("n_tools"),
            F.sum(F.length(F.coalesce("text", F.lit(""))))
            .cast("long").alias("total_chars"),
            F.round(F.avg(F.length(F.coalesce("text", F.lit("")))), 6)
            .alias("avg_turn_chars"),
            # unix_micros keeps fractional seconds (unix_timestamp
            # truncates; NTZ won't cast straight to double under ANSI) —
            # matches DuckDB epoch() exactly in the UTC session
            F.round(
                (
                    F.unix_micros(F.max("ts").cast("timestamp"))
                    - F.unix_micros(F.min("ts").cast("timestamp"))
                )
                / 1e6,
                6,
            ).alias("duration_s"),
            F.round(
                F.when(
                    n_turns > 1,
                    F.sum("_alt").cast("double") / (n_turns - 1),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("alternation_rate"),
        )
    )


def tool_chains(transcripts: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Frequent tool-invocation sequences over input_hint-shaped
    transcripts: each conversation's tool calls in turn order, counted
    as sliding n-grams across the corpus — the "which tool follows
    which" mining behind agent-workflow analytics.  Deterministic
    order: count desc, then chain asc.  Returns top-k
    (chain, n_convs, count); chains render as ``a>b>c``.

    Scale shape: one per-conversation hash aggregate (ordered
    struct-collect — run length = that conversation's tool calls, never
    the corpus), a bounded n-gram explode, and a two-level hash
    aggregate with TakeOrderedAndProject top-k.
    """
    if n < 1 or k < 1:
        raise ValueError("n and k must be positive")
    calls = transcripts.where(F.col("tool").isNotNull()).select(
        "conv_id", "turn_idx", "tool"
    )
    seqs = calls.groupBy("conv_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("turn_idx", "tool"))),
            lambda s: s["tool"],
        ).alias("tools")
    )
    idx = F.when(
        F.size("tools") >= n, F.sequence(F.lit(0), F.size("tools") - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = seqs.select(
        "conv_id",
        F.explode(
            F.transform(idx, lambda i: F.array_join(F.slice(F.col("tools"), i + 1, n), ">"))
        ).alias("chain"),
    )
    return (
        grams.groupBy("chain")
        .agg(
            F.count_distinct("conv_id").alias("n_convs"),
            F.count(F.lit(1)).cast("long").alias("count"),
        )
        .orderBy(F.desc("count"), F.asc("chain"))
        .limit(k)
    )


def role_transitions(transcripts: DataFrame) -> DataFrame:
    """Role→role Markov transition matrix over input_hint-shaped
    transcripts: for every consecutive turn pair within a conversation,
    count the (from_role, to_role) transition and normalise per source
    row — the dialogue-structure fingerprint (does the assistant always
    answer the user? how often do tool turns chain?).

    Returns (from_role, to_role, n, prob) with prob = n / Σ_to n, i.e.
    each from_role row of the matrix sums to 1.

    ONE data shuffle: the lag window hash-partitions on ``conv_id``;
    the transition count is a map-side-combinable hash aggregate on a
    key space bounded by |roles|² (a handful of rows), and the per-row
    normaliser is a broadcast join of that tiny aggregate against
    itself.  Everything is JVM expressions — no Python in the path.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = (
        transcripts.select(
            "conv_id",
            F.lag("role").over(w).alias("from_role"),
            F.col("role").alias("to_role"),
        )
        .where(F.col("from_role").isNotNull())
        .groupBy("from_role", "to_role")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = pairs.groupBy("from_role").agg(F.sum("n").alias("n_from"))
    return (
        pairs.join(F.broadcast(totals), "from_role")
        .select(
            "from_role",
            "to_role",
            "n",
            F.round(F.col("n") / F.col("n_from"), 6).alias("prob"),
        )
    )


def turn_latency(transcripts: DataFrame) -> DataFrame:
    """Per-role response-latency distribution over input_hint-shaped
    transcripts: latency of a turn = its ``ts`` minus the previous
    turn's ``ts`` in the same conversation (stable ``turn_idx`` order).
    Grouped by the RESPONDING turn's role — "how long does the
    assistant/tool take to come back" is the first SLO chart on any
    agent-ops dashboard.

    Returns (role, n, mean_s, p50_s, p95_s, max_s); percentiles are
    EXACT (``F.percentile``, linear interpolation — the same definition
    as DuckDB/ANSI ``quantile_cont``, so the oracle twins bit-for-bit).
    At 10^12 turns exact percentiles over a |roles|-way group are fine:
    the groupBy key space is tiny but each group is huge, so Spark's
    percentile buffers per-group values — swap to
    ``percentile_approx`` when groups stop fitting; the column contract
    is unchanged.  One window shuffle on ``conv_id`` + one aggregate.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = F.unix_micros(F.col("ts").cast("timestamp")) / 1e6
    lat = (t - F.lag(t).over(w)).alias("latency_s")
    rows = transcripts.select("conv_id", "role", lat).where(
        F.col("latency_s").isNotNull()
    )
    return (
        rows.groupBy("role")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("latency_s"), 6).alias("mean_s"),
            F.round(F.percentile("latency_s", F.lit(0.5)), 6).alias("p50_s"),
            F.round(F.percentile("latency_s", F.lit(0.95)), 6).alias("p95_s"),
            F.round(F.max("latency_s"), 6).alias("max_s"),
        )
    )


def tool_retries(transcripts: DataFrame) -> DataFrame:
    """Consecutive same-tool invocation runs — the agent-ops retry/flail
    signal: a tool called on back-to-back tool turns of one conversation
    is usually a failed call being retried (or a loop).  Computes
    run-length encoding of each conversation's tool-call sequence and
    aggregates per tool.

    Returns (tool, n_runs, n_calls, n_retry_runs, max_run, retry_rate):
    a "run" is a maximal streak of consecutive calls to the same tool
    within a conversation's tool-turn sequence; retry runs have
    length ≥ 2; retry_rate = n_retry_runs / n_runs.

    Scale: the classic gaps-and-islands double window (lag marker +
    running sum) — both windows share ONE conv_id hash exchange, then
    two map-side-combinable aggregates (run key space ≤ tool calls,
    final key space = |tools|).
    """
    from pyspark.sql import Window

    calls = transcripts.where(F.col("tool").isNotNull()).select(
        "conv_id", "turn_idx", "tool"
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    new_run = F.when(
        F.lag("tool").over(w).isNull() | (F.col("tool") != F.lag("tool").over(w)), 1
    ).otherwise(0)
    runs = (
        calls.withColumn("_new", new_run)
        .withColumn("run_id", F.sum("_new").over(w))
        .groupBy("conv_id", "run_id", "tool")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return runs.groupBy("tool").agg(
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.sum("run_len").cast("long").alias("n_calls"),
        F.sum((F.col("run_len") >= 2).cast("long")).cast("long").alias("n_retry_runs"),
        F.max("run_len").cast("long").alias("max_run"),
        F.round(
            F.sum((F.col("run_len") >= 2).cast("long")) / F.count(F.lit(1)), 6
        ).alias("retry_rate"),
    )


def conversation_endings(transcripts: DataFrame) -> DataFrame:
    """How conversations END — the abandonment/completion breakdown: a
    conversation whose last turn is a *user* turn was abandoned
    mid-request; ending on an *assistant* turn is the completed shape;
    ending on a *tool* turn is a crashed/truncated agent loop.

    Returns one row per terminal role: (last_role, n_convs, frac,
    avg_turns, avg_duration_s) — duration from first to last ts.

    Scale: ONE conv_id-keyed aggregate (max_by(role, turn_idx) picks the
    terminal role without a window), then a |roles|-key aggregate with
    the corpus total attached by a 1-row broadcast cross join.
    """
    per = transcripts.groupBy("conv_id").agg(
        F.max_by("role", "turn_idx").alias("last_role"),
        F.count(F.lit(1)).alias("n_turns"),
        (
            (
                F.unix_micros(F.max("ts").cast("timestamp"))
                - F.unix_micros(F.min("ts").cast("timestamp"))
            )
            / 1e6
        ).alias("dur_s"),
    )
    tot = per.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
    return (
        per.groupBy("last_role")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_convs"),
            F.round(F.avg("n_turns"), 6).alias("avg_turns"),
            F.round(F.avg("dur_s"), 6).alias("avg_duration_s"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "last_role",
            "n_convs",
            F.round(F.col("n_convs") / F.col("n_total"), 6).alias("frac"),
            "avg_turns",
            "avg_duration_s",
        )
    )


def turn_boilerplate(transcripts: DataFrame, min_convs: int = 2) -> DataFrame:
    """Cross-conversation repeated-turn detection — the transcript twin
    of corpus dedup: turn texts that recur in ≥ ``min_convs`` DISTINCT
    conversations are templates/boilerplate (canned greetings, retry
    prompts, tool wrappers) and usually get down-weighted or stripped
    before training on transcripts.

    Keyed by md5 of the whitespace-normalised lower-cased text (the
    fingerprint convention of textops.fingerprint), so matching is
    robust to spacing.  Returns (fp, role, n_convs, n_turns,
    sample_text) with sample_text = the lexicographically-first raw
    text of the group (deterministic).

    Scale: one (fp, role) hash aggregate — map-side combinable,
    dedup_exact's shape; no window, no join.
    """
    norm = F.regexp_replace(
        F.lower(F.trim(F.coalesce(F.col("text"), F.lit("")))), r"\s+", " "
    )
    rows = transcripts.select(
        "conv_id", "role", F.col("text"), F.md5(norm).alias("fp")
    )
    return (
        rows.groupBy("fp", "role")
        .agg(
            F.count_distinct("conv_id").alias("n_convs"),
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.min("text").alias("sample_text"),
        )
        .where(F.col("n_convs") >= min_convs)
    )


def session_concurrency(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_s: float = 1800.0,
    tiebreak: str | None = None,
) -> DataFrame:
    """Concurrent-session timeline: sessionize, then sweep the session
    intervals — +1 at each start, −1 at each end, half-open [start, end)
    so a session ending exactly when another starts never overlaps it —
    and report the number of simultaneously OPEN sessions after every
    boundary instant.  The capacity-planning / account-sharing view of
    the session table: peaks are load, sustained high plateaus from one
    tenant are shared credentials.  Returns (t, n_delta, concurrent)
    ordered by t; max(concurrent) is peak load.

    Scale shape: the sweep runs on the SESSION table (two rows per
    session), not on events; boundaries aggregate per instant (map-side
    combinable) and the running sum is one global-ordered window over
    |distinct boundary instants| rows — bounded by 2·|sessions|, the
    only non-partitioned stage, itself bounded far below the event
    count.  For a per-tenant timeline partition the window by tenant.
    """
    s = sessionize(df, key=key, ts_col=ts_col, gap_s=gap_s, tiebreak=tiebreak)
    b = (
        s.select(F.col("session_start").alias("t"), F.lit(1).alias("d"))
        .unionByName(s.select(F.col("session_end").alias("t"), F.lit(-1).alias("d")))
        .groupBy("t")
        .agg(F.sum("d").alias("n_delta"))
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return b.select(
        "t",
        F.col("n_delta").cast("long").alias("n_delta"),
        F.sum("n_delta").over(w).cast("long").alias("concurrent"),
    )


def session_entries_exits(
    df: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    label_col: str = "event_type",
    gap_s: float = 1800.0,
    tiebreak: str | None = None,
) -> DataFrame:
    """Entry/exit census per label over gap-split sessions: for each
    label, how many sessions START with it, END with it, and are
    single-event BOUNCES of it — the landing/exit-page report that
    tells a funnel where journeys begin and die.  Shares are of the
    total session count so rows are comparable.  Returns (label,
    n_entries, n_exits, n_bounces, entry_share, exit_share).

    Scale shape: ONE per-key ordered window pass derives the session
    ordinal AND first/last flags together (no join back to sessionize's
    aggregate), then a label hash aggregate; the 1-row session total
    broadcasts.
    """
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    ep = F.unix_micros(F.col(ts_col).cast("timestamp")) / 1e6
    marked = df.select(
        key, F.col(label_col).alias("lbl"), ep.alias("t"),
        *( [F.col(tiebreak).alias("_tb")] if tiebreak else [] ),
    ).withColumn(
        "new_s",
        F.when(
            F.lag("t").over(
                Window.partitionBy(key).orderBy(*(["t"] + (["_tb"] if tiebreak else [])))
            ).isNull()
            | (F.col("t") - F.lag("t").over(
                Window.partitionBy(key).orderBy(*(["t"] + (["_tb"] if tiebreak else [])))
            ) > float(gap_s)),
            1,
        ).otherwise(0),
    )
    w2 = Window.partitionBy(key).orderBy(*(["t"] + (["_tb"] if tiebreak else []))).rowsBetween(
        Window.unboundedPreceding, 0
    )
    sess = marked.withColumn("sid", F.sum("new_s").over(w2))
    w3 = Window.partitionBy(key, "sid").orderBy(*(["t"] + (["_tb"] if tiebreak else [])))
    flagged = sess.select(
        "lbl",
        (F.row_number().over(w3) == 1).cast("long").alias("is_entry"),
        (F.row_number().over(
            Window.partitionBy(key, "sid").orderBy(
                *([F.desc("t")] + ([F.desc("_tb")] if tiebreak else []))
            )
        ) == 1).cast("long").alias("is_exit"),
        (F.count(F.lit(1)).over(Window.partitionBy(key, "sid")) == 1).cast("long").alias("is_single"),
    )
    agg = flagged.groupBy(F.col("lbl").alias("label")).agg(
        F.sum("is_entry").alias("n_entries"),
        F.sum("is_exit").alias("n_exits"),
        F.sum(F.col("is_entry") * F.col("is_single")).alias("n_bounces"),
    )
    tot = agg.agg(F.sum("n_entries").alias("n_sessions"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "label", "n_entries", "n_exits", "n_bounces",
        F.round(F.col("n_entries") / F.col("n_sessions"), 6).alias("entry_share"),
        F.round(F.col("n_exits") / F.col("n_sessions"), 6).alias("exit_share"),
    )
