"""Deterministic sampling / splitting for training-data pipelines.

Both operators key every decision off ``md5(seed || ':' || id)`` — a pure
function of the row identity — instead of ``F.rand()`` / ``randomSplit``:

- stable under task retries and speculative execution (``rand`` is not:
  a re-run task re-draws its rows);
- stable under data growth — appending new documents never reshuffles an
  existing row's split, so yesterday's eval set stays yesterday's eval
  set (the property a 100 TB corpus that is continuously ingested needs);
- reproducible in plain SQL (md5 is the portability convention of this
  repo, see operators/dedup.py), so every operator here is
  oracle-checkable in DuckDB.

Everything is a single projection / filter — no shuffle, no Python, full
whole-stage codegen; Catalyst pushes the filters into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 32  # md5's first 8 hex chars, uniform on [0, 2^32)


def _bucket(id_col: str, seed: int):
    """Uniform bucket in [0, 2^32): first 8 hex chars of md5(seed:id)."""
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    return F.conv(F.substring(key, 1, 8), 16, 10).cast("long")


def split_thresholds(weights: dict[str, float]) -> list[int]:
    """Cumulative bucket thresholds for all but the last split name —
    shared by :func:`hash_split` and its SQL oracle so both sides compare
    against byte-identical integers."""
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty map of positive numbers")
    total = float(sum(weights.values()))
    out, cum = [], 0.0
    for name in list(weights)[:-1]:
        cum += weights[name] / total
        out.append(int(cum * _BUCKETS))
    return out


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's split is a pure
    function of ``(id, seed)``.  ``weights`` maps split name → relative
    weight (insertion order defines the bucket ranges); default
    98/1/1 train/val/test.  Returns the input plus (bucket, split).
    """
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    names = list(weights)
    thresholds = split_thresholds(weights)
    b = _bucket(id_col, seed)
    expr = None
    for name, thr in zip(names[:-1], thresholds):
        expr = F.when(b < thr, name) if expr is None else expr.when(b < thr, name)
    split = F.lit(names[0]) if expr is None else expr.otherwise(names[-1])
    return df.select("*", b.alias("bucket"), split.alias("split"))


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    col: str = "text",
    id_col: str = "doc_id",
    block: int = 1 << 20,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are (logically)
    concatenated in ``id_col`` order and cut every ``capacity`` tokens; a
    document's training bin is the chunk where it STARTS —
    ``bin = floor(start_offset / capacity)`` with ``start_offset`` the
    exclusive running token total.  Returns (doc_id, n_tokens,
    start_offset, bin).  Token counts are whitespace tokens
    (:func:`leidenalg_spark.operators.textops.tokens_col` semantics, so
    this matches ``token_count``'s ``n_tokens`` exactly).

    Scale: the global running sum is a classic two-pass distributed
    prefix sum, NOT one global window (which would serialise 100 TB into
    a single task): ids are split into contiguous blocks of ``block``
    ids, per-block totals (a tiny ``n_ids/block``-row table) are
    prefix-summed on one small task and broadcast back as block offsets,
    and the per-row cumsum runs inside each block's bounded window
    partition.  Both exchanges are key-partitioned; no Python.
    """
    from .textops import tokens_col
    from pyspark.sql import Window

    if capacity <= 0:
        raise ValueError("capacity must be positive")
    toks = F.size(tokens_col(col)).cast("long")
    blk = F.floor(F.col(id_col) / F.lit(block)).cast("long")
    base = docs.select(id_col, toks.alias("n_tokens"), blk.alias("blk"))
    btot = base.groupBy("blk").agg(F.sum("n_tokens").alias("bt"))
    # the block-totals table is ~n_ids/2^20 rows — the unpartitioned
    # window (single small task) is the intended reduction, not a smell
    wb = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    boff = btot.select("blk", F.coalesce(F.sum("bt").over(wb), F.lit(0)).alias("off"))
    win = (
        Window.partitionBy("blk").orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(boff), "blk")
        .withColumn("cum", F.sum("n_tokens").over(win))
        .select(
            id_col,
            "n_tokens",
            (F.col("off") + F.col("cum") - F.col("n_tokens")).alias("start_offset"),
        )
        .withColumn("bin", F.floor(F.col("start_offset") / F.lit(capacity)).cast("long"))
    )


def mixture_weights(weights: dict[str, float], temperature: float = 1.0) -> dict[str, float]:
    """Per-source keep fractions for temperature-flattened mixture
    sampling (the public multilingual-corpus convention, e.g. XLM-R /
    mT5): ``p_s ∝ w_s^(1/T)``, rescaled so the LARGEST fraction is 1.0 —
    the dominant source is kept in full and every other source is
    downsampled to the flattened ratio.  ``T=1`` keeps the given ratios;
    ``T→∞`` flattens towards uniform.  Shared by :func:`mixture_sample`
    and its SQL oracle so both sides compare identical thresholds."""
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be a non-empty map of positive numbers")
    scaled = {s: float(w) ** (1.0 / temperature) for s, w in weights.items()}
    mx = max(scaled.values())
    return {s: v / mx for s, v in scaled.items()}


def mixture_sample(
    df: DataFrame,
    source_weights: dict[str, float],
    temperature: float = 1.0,
    source_col: str = "source",
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic temperature-weighted mixture sampling across corpus
    sources: each row's retention is a pure function of ``(id, seed)``
    with a per-source fraction from :func:`mixture_weights` — append-
    stable and retry-stable like every sampler in this module.  Sources
    absent from ``source_weights`` keep 0 rows (explicit opt-in)."""
    fracs = mixture_weights(source_weights, temperature)
    return stratified_sample(df, fracs, strata_col=source_col, seed=seed, id_col=id_col)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float] | float,
    strata_col: str | None = None,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic (approximate, hash-based) sample.  ``fractions`` is
    either one global fraction or a map stratum-value → fraction with
    ``strata_col`` naming the stratum column (absent strata keep 0 rows).
    Row retention is a pure function of ``(id, seed)`` — appending data
    never changes which existing rows are sampled.
    """
    b = _bucket(id_col, seed)
    if isinstance(fractions, dict):
        if strata_col is None:
            raise ValueError("strata_col is required when fractions is a map")
        thr = None
        for k, frac in fractions.items():
            t = F.when(F.col(strata_col) == k, F.lit(int(float(frac) * _BUCKETS)))
            thr = t if thr is None else thr.when(F.col(strata_col) == k, F.lit(int(float(frac) * _BUCKETS)))
        keep = b < F.coalesce(thr, F.lit(0))
    else:
        keep = b < F.lit(int(float(fractions) * _BUCKETS))
    return df.where(keep)


def neighbor_sample(
    spark,
    edges,
    seeds,
    fanouts=(10, 5),
    seed: int = 42,
) -> "DataFrame":
    """GraphSAGE-style layered neighbor sampling over the symmetrised
    simple graph: hop ``h`` keeps at most ``fanouts[h-1]`` neighbours per
    (root, frontier-vertex) pair, chosen by md5 priority — deterministic,
    retry/append-stable, SQL-reproducible (never ``rand()``); the sampled
    block is what a GNN trainer's loader materialises per mini-batch.

    ``seeds``: DataFrame with column ``id`` (the mini-batch roots).
    Returns ``(root, hop, src, dst)`` — the sampled adjacency, one row
    per kept edge instance.  Revisits are allowed across hops (standard
    GraphSAGE semantics — the sample is a computation tree, not a
    subgraph).

    Scale shape: per hop ONE frontier⋈adjacency equi-join and one
    per-(root, v) top-f window (partition count = frontier size — hub
    fan-out is capped at f BEFORE the next hop, so frontiers grow at
    most ×f per hop and a tool-hub vertex contributes f rows, not
    deg rows).
    """
    from pyspark.sql import Window

    sym = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = sym.unionByName(sym.select(F.col("b").alias("a"), F.col("a").alias("b"))).persist()
    frontier = seeds.select(F.col("id").alias("root"), F.col("id").alias("v"))
    layers = []
    for h, f in enumerate(fanouts, 1):
        cand = frontier.join(adj.withColumnRenamed("a", "v"), "v")
        pri = F.md5(
            F.concat_ws(
                ":", F.lit(str(seed)), F.lit(str(h)),
                F.col("root").cast("string"), F.col("v").cast("string"),
                F.col("b").cast("string"),
            )
        )
        w = Window.partitionBy("root", "v").orderBy(pri, F.col("b"))
        pick = (
            cand.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= int(f))
            .select(
                "root", F.lit(h).cast("int").alias("hop"),
                F.col("v").alias("src"), F.col("b").alias("dst"),
            )
        )
        layers.append(pick)
        frontier = pick.select("root", F.col("dst").alias("v")).distinct()
    out = layers[0]
    for l in layers[1:]:
        out = out.unionByName(l)
    out = out.localCheckpoint(eager=True)
    adj.unpersist()
    return out


def importance_sample(
    docs: DataFrame,
    n: int,
    weight,
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006 A-Res, the :func:`random_walks` key reused at document
    granularity): keep the ``n`` rows with the largest ``u^(1/w)``,
    ``u = md5-uniform(seed, id)`` — the importance-resampling primitive
    behind DSIR-style training-data selection (resample a raw corpus
    toward a target distribution by importance weight).  Rows with
    non-positive weight carry no probability mass and are excluded.

    Same md5 determinism contract as :func:`hash_split`: retry-stable,
    append-stable (existing rows keep their keys when new rows land),
    engine-reproducible in plain SQL.  Returns (id, weight, sample_key)
    — the top-n by key desc then id asc.

    Scale: one projection + ``TakeOrderedAndProject`` top-n (per-
    partition heaps merged on the driver) — no shuffle of the corpus.
    """
    if n < 1:
        raise ValueError("n must be positive")
    w = F.col(weight) if isinstance(weight, str) else weight
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(str(seed)), F.col(id_col).cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / F.lit(4294967296.0)
    key = F.pow(u, 1.0 / w.cast("double"))
    return (
        docs.where(w > 0)
        .select(
            F.col(id_col),
            w.cast("double").alias("weight"),
            key.alias("_k"),
        )
        .orderBy(F.desc("_k"), F.asc(id_col))
        .limit(n)
        .select(id_col, "weight", F.round(F.col("_k"), 6).alias("sample_key"))
    )


def balance_labels(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic class-balanced downsampling: keep exactly
    ``min(class count)`` rows of EVERY class, electing survivors by
    md5(seed, id) rank within the class — the classifier-training
    rebalance that, unlike ``sampleBy`` fractions, is exact-count,
    retry-stable and append-stable (a rerun or a backfill elects the
    same rows).  Returns the input's (id, label) plus the rank key.

    Scale shape: one class-count aggregate (broadcast), one md5
    projection, one rank window PER CLASS (partitioned — no global
    sort), one filter.
    """
    from pyspark.sql import Window

    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("n"))
    floor_n = counts.agg(F.min("n").alias("n_min"))
    key = F.md5(
        F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(label_col).orderBy(key, F.col(id_col))
    ranked = df.select(id_col, label_col).withColumn(
        "rk", F.row_number().over(w)
    ).crossJoin(F.broadcast(floor_n))
    return ranked.where(F.col("rk") <= F.col("n_min")).select(
        id_col, label_col, F.col("rk").cast("long").alias("rk")
    )


def k_anonymity(
    df: DataFrame, quasi_cols, k: int = 5
) -> DataFrame:
    """k-anonymity profile over a set of quasi-identifier columns
    (Sweeney 2002): group rows by their quasi-identifier combination and
    report every equivalence class with its size and whether it meets
    the ``k`` bar — the standard release-safety audit before a dataset
    (or a training corpus's metadata) leaves a trust boundary.  A class
    below ``k`` means those rows are re-identifiable by linking the
    quasi-identifiers alone.

    Returns one row per equivalence class:
    (*quasi_cols, class_size, meets_k) — the share of at-risk ROWS is
    ``sum(class_size where !meets_k) / sum(class_size)`` downstream.

    Scale shape: ONE hash aggregate over the quasi columns (map-side
    partial agg); no joins, no windows.
    """
    quasi = list(quasi_cols)
    return (
        df.groupBy(*quasi)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .select(
            *quasi,
            F.col("class_size").cast("long").alias("class_size"),
            (F.col("class_size") >= k).alias("meets_k"),
        )
    )


def l_diversity(
    df: DataFrame, quasi_cols, sensitive_col: str, l: int = 2
) -> DataFrame:
    """l-diversity audit (Machanavajjhala 2007) — the attribute-disclosure
    companion of :func:`k_anonymity`: a quasi-identifier equivalence class
    can be large (k-anonymous) yet still leak if every row in it shares
    the same SENSITIVE value.  Per class, reports the row count, the
    number of distinct sensitive values, and whether it meets the ``l``
    bar.  Returns (*quasi_cols, class_size, n_sensitive, meets_l).

    Scale shape: ONE hash aggregate over the quasi columns with a
    distinct-count on the sensitive column (partial aggregation applies;
    for approximate audits at extreme cardinality swap in
    approx_count_distinct) — no joins, no windows.
    """
    cols = [quasi_cols] if isinstance(quasi_cols, str) else list(quasi_cols)
    return (
        df.groupBy(*cols)
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.countDistinct(sensitive_col).alias("n_sensitive"),
        )
        .withColumn("meets_l", F.col("n_sensitive") >= int(l))
    )


def disparate_impact(
    df: DataFrame, group_col: str, outcome_col, threshold: float = 0.8
) -> DataFrame:
    """Disparate-impact audit (the EEOC four-fifths rule): per group, the
    positive-outcome rate and its ratio to the MOST-favoured group's
    rate; a ratio below ``threshold`` (0.8 by default) flags adverse
    impact — the first-line fairness screen on any labelled or filtered
    dataset (e.g. "does the quality filter pass one source's docs at
    half the rate of another's?").  ``outcome_col`` may be a column name
    or a boolean Column expression.  Returns (group, n, n_positive,
    rate, impact_ratio, adverse) sorted by group.

    Scale shape: ONE hash aggregate over the group column (map-side
    combinable) + a 1-row max-rate broadcast cross join — no windows,
    no self-joins.
    """
    out = F.col(outcome_col) if isinstance(outcome_col, str) else outcome_col
    g = (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(out.cast("long")).alias("n_positive"),
        )
        .withColumn("rate", F.round(F.col("n_positive") / F.col("n"), 6))
    )
    mx = g.agg(F.max("rate").alias("max_rate"))
    ratio = F.when(F.col("max_rate") > 0, F.round(F.col("rate") / F.col("max_rate"), 6))
    return (
        g.crossJoin(F.broadcast(mx))
        .select(
            F.col("grp").alias(group_col), "n", "n_positive", "rate",
            ratio.alias("impact_ratio"),
            F.coalesce(ratio < float(threshold), F.lit(False)).alias("adverse"),
        )
    )


def t_closeness(
    df: DataFrame, quasi_cols, sensitive_col: str, t: float = 0.2
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007) — the
    distribution-level member of the privacy trio after
    :func:`k_anonymity` and :func:`l_diversity`: an equivalence class
    can be large AND diverse yet still leak when its sensitive-value
    MIX differs sharply from the corpus-wide one (e.g. one day's events
    are 90% 'error' against a 5% base rate).  For a categorical
    sensitive attribute under the uniform ground distance the EMD
    reduces to the total variation distance; values absent from a class
    contribute their global mass analytically
    (``1 − Σ_{v∈class} p_global(v)``), so the zero cells never
    materialise.  Returns (*quasi_cols, class_size, tvd, meets_t).

    Scale shape: one (quasi, sensitive) hash aggregate + one
    |sensitive|-row broadcast of the global distribution + one
    per-class re-aggregate — no windows, no self-joins, no outer join
    against the value domain.
    """
    cols = [quasi_cols] if isinstance(quasi_cols, str) else list(quasi_cols)
    cell = df.groupBy(*cols, sensitive_col).agg(F.count(F.lit(1)).alias("n_vs"))
    glob = (
        df.groupBy(sensitive_col)
        .agg(F.count(F.lit(1)).alias("n_v"))
        .crossJoin(F.broadcast(df.agg(F.count(F.lit(1)).alias("n_tot"))))
        .select(sensitive_col, (F.col("n_v") / F.col("n_tot")).alias("p_g"))
    )
    from pyspark.sql import Window

    # class size via a window over the |cells|-row aggregate — not a
    # second scan of the corpus (the cell subtree would otherwise be
    # recomputed for an uncached two-consumer plan)
    cell = cell.withColumn(
        "class_size", F.sum("n_vs").over(Window.partitionBy(*cols))
    )
    per_cell = cell.join(F.broadcast(glob), sensitive_col)
    agg = per_cell.groupBy(*cols).agg(
        F.first("class_size").cast("long").alias("class_size"),
        F.sum(F.abs(F.col("n_vs") / F.col("class_size") - F.col("p_g"))).alias("dev_in"),
        F.sum("p_g").alias("mass_in"),
    )
    return agg.select(
        *cols,
        "class_size",
        F.round(0.5 * (F.col("dev_in") + 1.0 - F.col("mass_in")), 6).alias("tvd"),
    ).withColumn("meets_t", F.col("tvd") <= float(t))
