"""Deterministic graph generators — the igraph constructor surface
(``Graph.Ring`` / ``Star`` / ``Full`` / ``Lattice`` / ``Erdos_Renyi``;
reference users build fixture and null-model graphs with these before
handing them to leidenalg) plus R-MAT (Chakrabarti et al. 2004, the
Graph500 generator), which is the shape that actually scales: every
edge is generated independently from its index, so a 10^12-edge graph
is one ``spark.range(m)`` projection with no shuffle, no driver state
and no Python row path.

Determinism: all randomness is md5-derived (``uniform(i, level) =
int(md5('rmat-{seed}-{i}-{level}')[:8], 16) / 2^32``) — the same
convention as the sampling operators, so every generator has an exact
DuckDB twin and regenerating any index range yields identical edges
(retry/backfill-stable on a cluster).

Structured generators (ring/star/full/lattice) are pure ``range``
projections; ``full`` is O(n²) output by definition and guarded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def ring(spark: SparkSession, n: int, directed: bool = False) -> DataFrame:
    """igraph ``Graph.Ring(n, circular=True)``: i → (i+1) mod n."""
    e = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    return e if directed else e.select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))


def star(spark: SparkSession, n: int, center: int = 0) -> DataFrame:
    """igraph ``Graph.Star(n, mode='out')``: center → every other vertex."""
    return (
        spark.range(n)
        .where(F.col("id") != center)
        .select(F.lit(center).cast("long").alias("src"), F.col("id").alias("dst"))
    )


def full(spark: SparkSession, n: int, loops: bool = False, max_vertices: int = 20_000) -> DataFrame:
    """igraph ``Graph.Full(n)``: every ordered pair (u < v for the
    canonical undirected form here).  O(n²) output — guarded."""
    if n > max_vertices:
        raise ValueError(f"full graph on {n} vertices is {n*(n-1)//2:,} edges; raise max_vertices explicitly")
    u = spark.range(n).select(F.col("id").alias("src"))
    v = spark.range(n).select(F.col("id").alias("dst"))
    cond = F.col("src") <= F.col("dst") if loops else F.col("src") < F.col("dst")
    return u.crossJoin(v).where(cond)


def lattice(spark: SparkSession, rows: int, cols: int) -> DataFrame:
    """igraph ``Graph.Lattice([rows, cols], circular=False)``: 2-D grid,
    right + down neighbours.  One range projection, no shuffle."""
    cell = spark.range(rows * cols).select(
        (F.col("id") / cols).cast("long").alias("r"), (F.col("id") % cols).alias("c")
    )
    right = cell.where(F.col("c") < cols - 1).select(
        (F.col("r") * cols + F.col("c")).alias("src"),
        (F.col("r") * cols + F.col("c") + 1).alias("dst"),
    )
    down = cell.where(F.col("r") < rows - 1).select(
        (F.col("r") * cols + F.col("c")).alias("src"),
        ((F.col("r") + 1) * cols + F.col("c")).alias("dst"),
    )
    return right.unionByName(down)


def _uniform(i: Column, level: Column, seed: int) -> Column:
    h = F.md5(F.concat_ws("-", F.lit("rmat"), F.lit(str(seed)), i.cast("string"), level.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)


def rmat(
    spark: SparkSession,
    scale: int,
    m: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
) -> DataFrame:
    """R-MAT / stochastic-Kronecker edges over n = 2^scale vertices
    (defaults are the Graph500 parameters; d = 1−a−b−c).  Edge i picks
    one quadrant per recursion level from ``uniform(i, level)``:
    row bit = r ≥ a+b, col bit = r∈[a,a+b) ∨ r ≥ a+b+c.  Self-loops and
    multi-edges are kept, as in the standard generator — ``.distinct()``
    or route through setops.graph_union to simplify.

    Scale: ONE ``spark.range(m)`` scan with per-row array expressions —
    zero shuffles, arbitrarily partitionable, deterministic per index.
    Returns (i, src, dst).
    """
    ab, abc = a + b, a + b + c
    levels = F.sequence(F.lit(0), F.lit(scale - 1))

    def bits(row: bool) -> Column:
        def term(l: Column) -> Column:
            r = _uniform(F.col("i"), l, seed)
            bit = (r >= ab) if row else ((r >= a) & (r < ab)) | (r >= abc)
            return bit.cast("double") * F.pow(F.lit(2.0), l.cast("double"))

        return F.aggregate(
            F.transform(levels, term), F.lit(0.0), lambda acc, x: acc + x
        ).cast("bigint")

    return spark.range(m).select(
        F.col("id").alias("i")
    ).select("i", bits(True).alias("src"), bits(False).alias("dst"))


def erdos_renyi_gnm(spark: SparkSession, n: int, m: int, seed: int = 42) -> DataFrame:
    """igraph ``Graph.Erdos_Renyi(n, m=...)`` in the with-replacement
    form: m uniform ordered pairs (the a=b=c=d RMAT degenerate case with
    a non-power-of-two modulus).  Each edge derives from its index alone
    — same zero-shuffle scale shape as :func:`rmat`."""
    h1 = F.conv(F.substring(F.md5(F.concat_ws("-", F.lit("gnm-s"), F.lit(str(seed)), F.col("i").cast("string"))), 1, 12), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(F.md5(F.concat_ws("-", F.lit("gnm-d"), F.lit(str(seed)), F.col("i").cast("string"))), 1, 12), 16, 10).cast("bigint")
    return spark.range(m).select(F.col("id").alias("i")).select(
        "i", (h1 % n).alias("src"), (h2 % n).alias("dst")
    )


def configuration_model(edges: DataFrame, seed: int = 42) -> DataFrame:
    """Degree-preserving null model — igraph ``Graph.Degree_Sequence(
    degrees, method='configuration')`` / ``rewire()``: the graph
    leidenalg users compare modularity against to judge significance.
    Takes an edge table, extracts the undirected degree sequence, and
    deterministically re-pairs the 2|E| stubs uniformly at random:
    stub (v, j) gets key md5('cfg-{seed}-{v}-{j}'), stubs are ranked by
    key, and rank 2i pairs with 2i+1.  Self-loops and multi-edges are
    kept (the standard configuration model; simplify downstream if
    unwanted).  Returns (pair_id, src, dst) with src/dst in key order.

    Scale: the global rank is computed WITHOUT a single-partition
    window — stubs are split into 256 range-disjoint buckets by their
    key's first two hex chars, per-bucket counts (256 rows) prefix-sum
    on the driver, and the rank is bucket offset + a per-bucket
    row_number window, so all heavy work stays parallel.  One explode +
    one windowed shuffle + one pair groupBy.
    """
    from pyspark.sql import Window

    und = edges.select(
        F.least(F.col("src").cast("string"), F.col("dst").cast("string")).alias("a"),
        F.greatest(F.col("src").cast("string"), F.col("dst").cast("string")).alias("b"),
    ).where(F.col("a") != F.col("b")).distinct()
    deg = (
        und.select(F.col("a").alias("v")).unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    )
    stubs = deg.select(
        "v", F.explode(F.sequence(F.lit(1), F.col("deg"))).alias("j")
    ).select(
        "v",
        F.md5(F.concat_ws("-", F.lit("cfg"), F.lit(str(seed)), "v", F.col("j").cast("string"))).alias("key"),
    )
    stubs = stubs.withColumn("bkt", F.substring("key", 1, 2)).persist()
    counts = {r.bkt: r.c for r in stubs.groupBy("bkt").agg(F.count(F.lit(1)).alias("c")).collect()}
    offs, acc = {}, 0
    for b in sorted(counts):
        offs[b] = acc
        acc += counts[b]
    off_col = F.create_map(*[x for b, o in sorted(offs.items()) for x in (F.lit(b), F.lit(o))])
    ranked = stubs.select(
        "v",
        (
            off_col[F.col("bkt")]
            + F.row_number().over(Window.partitionBy("bkt").orderBy("key"))
            - 1
        ).alias("rank"),
    )
    paired = ranked.select(
        (F.col("rank") / 2).cast("bigint").alias("pair_id"),
        (F.col("rank") % 2).alias("side"),
        "v",
    )
    out = (
        paired.groupBy("pair_id")
        .agg(
            F.min(F.when(F.col("side") == 0, F.col("v"))).alias("src"),
            F.min(F.when(F.col("side") == 1, F.col("v"))).alias("dst"),
        )
        .where(F.col("dst").isNotNull())  # odd stub total: drop the last
        .select("pair_id", "src", "dst")
    )
    out = out.localCheckpoint(eager=True)  # counts map already spent; free the cache
    stubs.unpersist()
    return out


def watts_strogatz(
    spark: SparkSession, n: int, k: int, p: float, seed: int = 42
) -> DataFrame:
    """Watts–Strogatz small-world graph — igraph ``Graph.Watts_Strogatz
    (dim=1, size=n, nei=k, p=p)``: a ring lattice (vertex i linked to
    i+1..i+k mod n) where each edge's far endpoint is rewired with
    probability ``p`` to a uniform replacement.  All randomness is
    md5-keyed by (seed, src, offset) — the rewire coin is the first
    8 hex chars / 2^32 (the R-MAT convention), the replacement dst is
    ``(src + 1 + draw mod (n-1)) mod n``, uniform over every vertex
    except src, so rewiring can never create a self-loop (parallel
    edges remain possible, as in igraph's default rewiring; simplify
    downstream if unwanted).  Returns (src, o, dst, rewired).

    Scale: one range() projection per edge index — ZERO shuffles,
    retry/backfill-stable, the same index-derived shape as
    :func:`rmat`; a 10^12-edge small-world graph is just a bigger
    range.
    """
    if not 0.0 <= p <= 1.0:
        raise ValueError("p must be in [0, 1]")
    if not 1 <= k < n:
        raise ValueError("need 1 <= k < n")
    base = spark.range(n).select(
        F.col("id").alias("src"),
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("o"),
    )
    tag = lambda pref: F.concat_ws(
        "-", F.lit(pref), F.lit(str(seed)),
        F.col("src").cast("string"), F.col("o").cast("string"),
    )
    r = (
        F.conv(F.substring(F.md5(tag("ws")), 1, 8), 16, 10).cast("double")
        / F.lit(4294967296.0)
    )
    h = F.conv(F.substring(F.md5(tag("wsd")), 1, 12), 16, 10).cast("bigint")
    lat = (F.col("src") + F.col("o")) % F.lit(n)
    rnd = (F.col("src") + 1 + (h % F.lit(n - 1))) % F.lit(n)
    return base.select(
        "src",
        F.col("o").cast("long").alias("o"),
        F.when(r < F.lit(float(p)), rnd).otherwise(lat).cast("long").alias("dst"),
        (r < F.lit(float(p))).alias("rewired"),
    )


def tree(spark: SparkSession, n: int, children: int = 2) -> DataFrame:
    """Regular rooted tree — igraph ``Graph.Tree(n, children)``: vertex
    i > 0 hangs off parent ``(i-1) // children``.  One range()
    projection, ZERO shuffles, index-derived like :func:`rmat`.
    Returns (src=parent, dst=child).
    """
    if children < 1:
        raise ValueError("children must be >= 1")
    return (
        spark.range(1, n)
        .select(
            ((F.col("id") - 1) / children).cast("long").alias("src"),
            F.col("id").alias("dst"),
        )
    )


def sbm_graph(
    spark: SparkSession,
    n: int,
    n_blocks: int = 4,
    p_in: float = 0.3,
    p_out: float = 0.02,
    seed: int = 42,
    max_vertices: int = 20_000,
) -> DataFrame:
    """Deterministic planted-partition / stochastic block model: vertex v
    belongs to block ``v % n_blocks``; each unordered pair (u < v) draws
    an md5-uniform in [0, 1) (the repo-wide no-Python-RNG convention —
    the SAME graph regenerates on every engine and every retry) and the
    edge exists when the draw is under ``p_in`` (same block) or
    ``p_out`` (different blocks).  THE community-detection benchmark
    family: detectability has a known threshold in (p_in − p_out)·n/k,
    so planted-recovery tests can dial the signal.  Returns
    (src, dst, weight, block_src, block_dst) with weight 1.0.

    Scale shape: the pair enumeration is one per-vertex
    ``explode(sequence(v+1, n−1))`` — index-derived, zero-shuffle,
    O(n²) rows in the scan but filtered map-side to the O(p·n²) edges;
    guarded like :func:`full` because the PAIR SPACE is quadratic by
    construction (web-scale SBMs sample per-vertex degree lists
    instead).
    """
    if n > max_vertices:
        raise ValueError(
            f"sbm on {n} vertices scans {n*(n-1)//2:,} pairs; raise max_vertices explicitly"
        )
    pairs = (
        spark.range(n)
        .select(
            F.col("id").alias("src"),
            F.explode(
                F.when(
                    F.col("id") < n - 1, F.sequence(F.col("id") + 1, F.lit(n - 1))
                ).otherwise(F.array().cast("array<bigint>"))
            ).alias("dst"),
        )
    )
    draw = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(seed), F.col("src"), F.col("dst"))), 1, 8
            ),
            16, 10,
        ).cast("double")
        / F.lit(float(2 ** 32))
    )
    bs, bd = F.col("src") % n_blocks, F.col("dst") % n_blocks
    p = F.when(bs == bd, F.lit(float(p_in))).otherwise(F.lit(float(p_out)))
    return (
        pairs.where(draw < p)
        .select(
            "src", "dst", F.lit(1.0).alias("weight"),
            bs.cast("long").alias("block_src"), bd.cast("long").alias("block_dst"),
        )
    )
