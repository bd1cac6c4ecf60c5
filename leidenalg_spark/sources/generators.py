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
