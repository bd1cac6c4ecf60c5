"""Edge-table derivation and canonicalisation (SURVEY.md §2.1 S6, §2.2).

The reference consumes an in-memory igraph; our upstream is a transcripts
(or events) table, from which we derive the reply/tool-interaction graph:

- vertices = conversation participants (``{conv_id}:{role}``) and tools
  (``tool:{name}`` — global hub vertices, the deterministic skew case)
- edges    = consecutive-turn links within a conversation (window lag —
  partitioned by ``conv_id``, so the sort is per-conversation and fully
  parallel; no global ordering anywhere) plus assistant→tool call links
- weight   = number of interactions after ``groupBy(src, dst)``

Scale notes (100 TB design):
- the only shuffles are the window by ``conv_id`` (narrow keys, high
  cardinality, no skew) and the final ``groupBy(src, dst)`` (AQE skew
  split handles tool hubs);
- vertex ids are ``xxhash64`` of the vertex name: deterministic,
  shuffle-free, computed inline at scan time.  ``assert_no_id_collisions``
  offers a cheap one-pass audit (count distinct names vs ids) for
  pipelines that require it; dense 0..n-1 ids (needed only by the
  local coarse kernel) are assigned after aggregation when the vertex
  set is already small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOOL_PREFIX = "tool:"


def actor_expr():
    """Vertex name of a transcript turn."""
    return F.when(
        F.col("role") == "tool", F.concat(F.lit(TOOL_PREFIX), F.coalesce(F.col("tool"), F.lit("unknown")))
    ).otherwise(F.concat(F.col("conv_id"), F.lit(":"), F.col("role")))


def derive_named_edges(transcripts: DataFrame, drop_self_loops: bool = True) -> DataFrame:
    """transcripts → named edge list (src_name, dst_name, weight).

    Consecutive-turn links via ``lag`` over (conv_id, turn_idx) — the
    as-of/consecutive-row join of SURVEY.md §2.6 — plus assistant→tool
    links for assistant turns that carry a tool.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = transcripts.withColumn("actor", actor_expr()).withColumn("prev_actor", F.lag("actor").over(w))
    turn_edges = t.where(F.col("prev_actor").isNotNull()).select(
        F.col("prev_actor").alias("src_name"), F.col("actor").alias("dst_name")
    )
    tool_edges = t.where((F.col("role") == "assistant") & F.col("tool").isNotNull()).select(
        F.col("actor").alias("src_name"),
        F.concat(F.lit(TOOL_PREFIX), F.col("tool")).alias("dst_name"),
    )
    e = turn_edges.unionByName(tool_edges)
    if drop_self_loops:
        e = e.where(F.col("src_name") != F.col("dst_name"))
    return e.groupBy("src_name", "dst_name").agg(F.count(F.lit(1)).cast("double").alias("weight"))


def canonicalize_undirected(edges: DataFrame, src="src", dst="dst") -> DataFrame:
    """Fold an undirected edge list so ``src <= dst`` and re-aggregate
    (one shuffle on the canonical pair; weights of both orientations sum)."""
    lo = F.least(F.col(src), F.col(dst))
    hi = F.greatest(F.col(src), F.col(dst))
    return (
        edges.select(lo.alias(src), hi.alias(dst), "weight")
        .groupBy(src, dst)
        .agg(F.sum("weight").alias("weight"))
    )


def with_hash_ids(named_edges: DataFrame) -> DataFrame:
    """Attach deterministic 64-bit vertex ids (no shuffle, no id table)."""
    return named_edges.select(
        F.xxhash64("src_name").alias("src"),
        F.xxhash64("dst_name").alias("dst"),
        "weight",
        "src_name",
        "dst_name",
    )


def vertex_table(named_edges: DataFrame) -> DataFrame:
    """Distinct (id, name) vertex table from a named edge list."""
    v = named_edges.select(F.col("src_name").alias("name")).unionByName(
        named_edges.select(F.col("dst_name").alias("name"))
    )
    return v.distinct().select(F.xxhash64("name").alias("id"), "name")


def assert_no_id_collisions(vertices: DataFrame) -> None:
    row = vertices.agg(
        F.countDistinct("name").alias("names"), F.countDistinct("id").alias("ids")
    ).first()
    if row["names"] != row["ids"]:
        raise RuntimeError(f"vertex id hash collision: {row['names']} names vs {row['ids']} ids")


def transcripts_to_edges(transcripts: DataFrame, undirected: bool = True, drop_self_loops: bool = True) -> DataFrame:
    """Full derivation: transcripts → (src, dst, weight) with hashed ids."""
    e = with_hash_ids(derive_named_edges(transcripts, drop_self_loops)).select("src", "dst", "weight")
    if undirected:
        e = canonicalize_undirected(e)
    return e


def events_to_type_transition_edges(events: DataFrame) -> DataFrame:
    """Driver-testdata variant (FIXTURES.md §3): consecutive events per
    user (ordered by ts, event_id as tiebreak) → edges between event
    types; weight = transition count.  Same window-lag operator as the
    transcript derivation, different source columns."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = events.withColumn("prev_type", F.lag("event_type").over(w))
    return (
        t.where(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src_name"), F.col("event_type").alias("dst_name"))
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def events_to_bipartite_edges(events: DataFrame) -> DataFrame:
    """user × event_type interaction graph: vertices are users
    (``u:{id}``) and event types (``t:{name}`` — hub vertices), edge
    weight = number of events."""
    return (
        events.groupBy(
            F.format_string("u:%d", F.col("user_id")).alias("src_name"),
            F.concat(F.lit("t:"), F.col("event_type")).alias("dst_name"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def degrees(edges: DataFrame, directed: bool = False) -> DataFrame:
    """Per-vertex degree and strength (unweighted count / weighted sum).

    Undirected convention: self-loops count twice (LocalGraph docstring).
    One union + one aggregation; partial aggregation (map-side combine)
    makes this a single light shuffle.
    """
    if directed:
        out = edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("out_degree"), F.sum("weight").alias("out_strength")
        )
        inn = edges.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("in_degree"), F.sum("weight").alias("in_strength")
        )
        return out.join(inn, "id", "full").na.fill(0)
    ends = edges.select(F.col("src").alias("id"), "weight").unionByName(
        edges.select(F.col("dst").alias("id"), "weight")
    )
    return ends.groupBy("id").agg(
        F.count(F.lit(1)).alias("degree"), F.sum("weight").alias("strength")
    )


def bipartite_project(
    edges: DataFrame,
    side: str = "src",
    weighting: str = "count",
    max_anchor_degree: int | None = 10_000,
) -> DataFrame:
    """Project a bipartite edge table ``(src, dst, weight)`` onto one
    vertex class: two ``side`` vertices are linked iff they share an
    anchor on the other side (user–user via common event types, doc–doc
    via common shingles — the standard one-mode co-interaction graph fed
    to Leiden when the bipartite CPM variant isn't wanted).

    ``weighting``: ``"count"`` = number of shared anchors;
    ``"product"`` = Σ_anchor w_a·w_b (the adjacency-matrix product
    B·Bᵀ off-diagonal); ``"newman"`` = Σ_anchor 1/(deg(anchor) − 1)
    (Newman's collaboration weighting, PRE 64 2001: an anchor shared
    with few others certifies a stronger tie than a crowd anchor —
    degree-1 anchors contribute nothing and are dropped).

    Scale shape: one self-equi-join keyed on the anchor — pair rows are
    bounded by Σ_anchor deg(anchor)², so a super-hub anchor (a stop-word
    shingle, a ubiquitous tool vertex) is quadratic in ITS degree alone.
    ``max_anchor_degree`` drops such anchors first (the ngram_jaccard
    ``max_shingle_freq`` convention: a hub anchor carries ~zero
    association signal but all of the cost); pass ``None`` only on
    inputs with bounded anchor degree.  Output keeps ``a < b`` (each
    undirected pair once).
    """
    anchor, node = ("dst", "src") if side == "src" else ("src", "dst")
    e = edges.select(
        F.col(anchor).alias("anchor"), F.col(node).alias("node"), "weight"
    )
    if max_anchor_degree is not None:
        deg = e.groupBy("anchor").agg(F.count(F.lit(1)).alias("d"))
        keep = deg.where(F.col("d") <= max_anchor_degree).select("anchor")
        e = e.join(keep, "anchor", "semi")
    if weighting == "newman":
        # ride the anchor degree on the join input; the same degree
        # aggregate the hub cap used (re-derived post-filter so capped
        # anchors don't shift surviving anchors' weights)
        nd = e.groupBy("anchor").agg(F.count(F.lit(1)).alias("anchor_deg"))
        e = e.join(nd.where(F.col("anchor_deg") > 1), "anchor")
    l = e.select("anchor", F.col("node").alias("a"), F.col("weight").alias("wa"),
                 *(["anchor_deg"] if weighting == "newman" else []))
    r = e.select("anchor", F.col("node").alias("b"), F.col("weight").alias("wb"))
    pairs = l.join(r, "anchor").where(F.col("a") < F.col("b"))
    if weighting == "product":
        wexpr = F.sum(F.col("wa") * F.col("wb"))
    elif weighting == "count":
        wexpr = F.count(F.lit(1)).cast("double")
    elif weighting == "newman":
        wexpr = F.sum(1.0 / (F.col("anchor_deg") - 1.0))
    else:
        raise ValueError(weighting)
    return pairs.groupBy(F.col("a").alias("src"), F.col("b").alias("dst")).agg(
        F.round(wexpr, 6).alias("weight")
    )


def degree_histogram(edges: DataFrame, directed: bool = False) -> DataFrame:
    """Log2-binned degree distribution of the multigraph — the
    power-law fingerprint read before choosing skew strategy (a heavy
    tail at high bins ⇒ salt the gather, cap wedge centers).

    Returns ``(bin, lo, hi, n_vertices)`` where bin b covers degrees
    [2^b, 2^{b+1}).  One degree aggregate + one |V|-row projection +
    one tiny aggregate — all map-side combinable.
    """
    deg = degrees(edges, directed=directed)
    dcol = F.col("out_degree") + F.col("in_degree") if directed else F.col("degree")
    b = F.floor(F.log2(dcol.cast("double"))).cast("int")
    return (
        deg.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
        .select(
            "bin",
            F.pow(F.lit(2.0), F.col("bin")).cast("long").alias("lo"),
            (F.pow(F.lit(2.0), F.col("bin") + 1) - 1).cast("long").alias("hi"),
            "n_vertices",
        )
    )


def graph_summary(edges: DataFrame) -> DataFrame:
    """One-row graph fingerprint — the igraph ``summary(g)`` habit:
    ``(n_vertices, n_edges, n_self_loops, total_weight, density,
    avg_degree, max_degree)``, where n_edges/density/degrees are over
    the simple undirected non-loop graph and total_weight sums the raw
    input rows.  The first thing read before choosing γ, shuffle
    partitioning, or a skew strategy (with :func:`degree_histogram`).

    Scale: three aggregates (edge rows, distinct simple edges, degrees)
    plus 1-row broadcast cross joins — nothing materialised beyond the
    |V|-row degree table.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    allv = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("name"))
        .unionByName(und.select(F.col("b").alias("name")))
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    base = edges.agg(
        F.coalesce(F.sum("weight"), F.lit(0.0)).alias("total_weight"),
        F.coalesce(
            F.sum(F.when(F.col("src") == F.col("dst"), 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_self_loops"),
    )
    nv = allv.agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
    ne = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    md = deg.agg(F.coalesce(F.max("d"), F.lit(0)).cast("long").alias("max_degree"))
    row = (
        nv.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(base))
        .crossJoin(F.broadcast(md))
    )
    n, m = F.col("n_vertices"), F.col("n_edges")
    return row.select(
        "n_vertices",
        "n_edges",
        "n_self_loops",
        F.round("total_weight", 6).alias("total_weight"),
        F.round(F.when(n > 1, 2.0 * m / (n * (n - 1.0))), 6).alias("density"),
        F.round(F.when(n > 0, 2.0 * m / n), 6).alias("avg_degree"),
        "max_degree",
    )


def edge_set_drift(sliced_edges: DataFrame) -> DataFrame:
    """Slice-to-slice EDGE-set stability over a temporal link graph —
    the structural companion of
    :func:`~leidenalg_spark.operators.community.community_drift` (which
    tracks memberships): for every consecutive slice pair, how many
    edges persisted, appeared, and vanished, plus the edge-set Jaccard.
    Input columns (slice:int-like, src, dst); edges are deduped per
    slice, direction preserved.  Returns one row per slice with a
    predecessor: (slice, n_prev, n_curr, n_common, n_new, n_gone,
    jaccard), 1e-6 rounded.

    Scale: one distinct per slice, one equi-join keyed
    (slice, src, dst) against the shifted copy, three map-side-combinable
    count aggregates — no windows, no collect.
    """
    cur = sliced_edges.select("slice", "src", "dst").distinct()
    prev = cur.select((F.col("slice") + 1).alias("slice"), "src", "dst")
    n_cur = cur.groupBy("slice").agg(F.count(F.lit(1)).alias("n_curr"))
    n_prev = prev.groupBy("slice").agg(F.count(F.lit(1)).alias("n_prev"))
    n_common = (
        cur.join(prev, ["slice", "src", "dst"])
        .groupBy("slice")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        n_prev.join(n_cur, "slice", "inner")
        .join(n_common, "slice", "left")
        .na.fill({"n_common": 0})
        .select(
            F.col("slice").cast("long").alias("slice"),
            F.col("n_prev").cast("long").alias("n_prev"),
            F.col("n_curr").cast("long").alias("n_curr"),
            F.col("n_common").cast("long").alias("n_common"),
            (F.col("n_curr") - F.col("n_common")).cast("long").alias("n_new"),
            (F.col("n_prev") - F.col("n_common")).cast("long").alias("n_gone"),
            F.round(
                F.col("n_common")
                / (F.col("n_prev") + F.col("n_curr") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def events_to_coactivity_edges(
    events: DataFrame,
    key: str = "user_id",
    label: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "hour",
    min_weight: int = 3,
) -> DataFrame:
    """Actor–actor co-activity graph: an edge between two actors for
    every (label, time-bucket) cell they BOTH act in, weight = number
    of shared cells, thresholded at ``min_weight``.  Unlike the
    bipartite and type-transition graphs this one is triangle-rich with
    genuine community structure — the graph the triangle-family kernels
    (embeddedness, clique percolation, graphlet orbits) want.

    Scale shape: the distinct (actor, label, bucket) projection is one
    hash aggregate; the within-cell pair join is bounded by the square
    of the LARGEST CELL (actors co-active in one hour on one label),
    not of any actor's history — at web scale cap hot cells the same
    way ngram_jaccard caps hub shingles (sample or split cells past a
    frequency bound) before the self-join.
    """
    b = (
        events.select(key, label, F.date_trunc(bucket, F.col(ts_col)).alias("h"))
        .distinct()
    )
    return (
        b.alias("x")
        .join(
            b.alias("y"),
            (F.col(f"x.{label}") == F.col(f"y.{label}"))
            & (F.col("x.h") == F.col("y.h"))
            & (F.col(f"x.{key}") < F.col(f"y.{key}")),
        )
        .groupBy(F.col(f"x.{key}").alias("src"), F.col(f"y.{key}").alias("dst"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_weight)
        .select("src", "dst", F.col("cnt").cast("double").alias("weight"))
    )


def events_to_decayed_edges(
    events: DataFrame, half_life_s: float = 604800.0
) -> DataFrame:
    """Recency-weighted type-transition edges: the same consecutive-event
    derivation as :func:`events_to_type_transition_edges`, but each
    transition contributes ``2^(−age / half_life_s)`` instead of 1,
    with age measured from the corpus horizon (global max ts) to the
    transition's later event.  The standard exponential-decay edge
    construction for evolving interaction graphs — a year-old link decays
    toward 0 while the graph stays ONE table, so downstream Leiden /
    PageRank track the CURRENT structure without hard slice cutoffs
    (the continuous-time alternative to slices_to_layers).

    Returns (src_name, dst_name, weight, n_transitions) — the raw count
    rides along so callers can tell "fresh but rare" from "stale but
    frequent".

    Scale shape: identical to the count derivation (one per-user lag
    window + one hash aggregate); the horizon is a 1-row broadcast cross
    join; the decay is pure column arithmetic inside the aggregate's
    map side.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = events.withColumn("prev_type", F.lag("event_type").over(w))
    hor = events.agg(F.max("ts").alias("horizon"))
    age = (
        F.unix_micros(F.col("horizon").cast("timestamp"))
        - F.unix_micros(F.col("ts").cast("timestamp"))
    ) / 1e6
    decay = F.pow(F.lit(2.0), -age / F.lit(float(half_life_s)))
    return (
        t.where(F.col("prev_type").isNotNull())
        .crossJoin(F.broadcast(hor))
        .groupBy(F.col("prev_type").alias("src_name"), F.col("event_type").alias("dst_name"))
        .agg(
            F.round(F.sum(decay), 6).alias("weight"),
            F.count(F.lit(1)).alias("n_transitions"),
        )
    )
