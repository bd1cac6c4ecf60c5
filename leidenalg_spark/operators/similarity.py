"""Similarity search over embedding columns (prescribed first-class op).

- brute-force cosine top-k: exact baseline.  The dot product runs as
  ``F.aggregate``/``F.zip_with`` over ``array<float>`` — JVM-side, no
  Python.  Elements are cast to double *before* multiplying and summed in
  index order, which makes the arithmetic bit-identical to the DuckDB
  oracle's ``list_``-lambda equivalent.
- LSH-bucketed variant (scale path): random-hyperplane signatures
  restrict candidate generation to equality joins on bucket keys —
  the 100 TB answer, since brute force is O(n·q) per query block.
- IVF-style variant: k-means-lite coarse centroids via deterministic
  seeding, probe the nearest ``nprobe`` cells.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x.cast("double") * x.cast("double")), F.lit(0.0), lambda acc, v: acc + v))


def cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k=10, id_col="vec_id", vec_col="embedding"
) -> DataFrame:
    """Exact top-k cosine neighbours for each query vector.

    ``queries`` is broadcast (the small side); the cross join + window
    rank keeps everything JVM-side.  Returns
    (query_id, neighbor_id, cos_sim, rank).
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    base = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"))
    cos = _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv")))
    scored = (
        base.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def random_hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def lsh_bucket_ids(embeddings: DataFrame, planes: np.ndarray, vec_col="embedding") -> DataFrame:
    """Sign-of-projection LSH signature per vector (JVM arithmetic:
    the projection is an F.aggregate dot product per plane)."""
    sig = None
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(F.col(vec_col), arr) > 0).cast("int")
        sig = bit if sig is None else sig * 2 + bit
    return embeddings.withColumn("bucket", sig)


def lsh_cosine_topk(
    embeddings: DataFrame, queries: DataFrame, k=10, n_planes=12, seed=42,
    id_col="vec_id", vec_col="embedding", dim=None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket
    (single equality join instead of a cross join), then exact cosine."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = random_hyperplanes(dim, n_planes, seed)
    e_b = lsh_bucket_ids(embeddings, planes, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), "bucket"
    )
    q_b = lsh_bucket_ids(queries, planes, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    cos = _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv")))
    scored = (
        e_b.join(F.broadcast(q_b), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_neardup_pairs(
    embeddings: DataFrame, threshold=0.95, id_col="vec_id", vec_col="embedding",
    max_id=None, n_planes=8, n_bands=4, seed=42, dim=None, exact=False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos >= threshold).

    Default path is LSH-routed: ``n_bands`` independent random-hyperplane
    signatures of ``n_planes`` bits each; two vectors become a candidate
    pair iff they share ANY band bucket (equality join per band, linear
    shuffle), then survivors are verified with the exact cosine.  At the
    default 4 bands × 8 planes, a pair at cos 0.95 (angle 18°) collides
    with probability 1-(1-(1-18/180)^8)^4 ≈ 0.97 — recall stays high
    while the all-pairs cross join (quadratic, the 100-TB killer) is
    gone.  ``exact=True`` restores the cross-join for small oracle
    baselines; ``max_id`` bounds either path to an id prefix.
    """
    e = embeddings
    if max_id is not None:
        e = e.where(F.col(id_col) < max_id)
    cos = _dot(F.col("av"), F.col("bv")) / (_norm(F.col("av")) * _norm(F.col("bv")))
    if exact:
        a = e.select(F.col(id_col).alias("a"), F.col(vec_col).alias("av"))
        b = e.select(F.col(id_col).alias("b"), F.col(vec_col).alias("bv"))
        return (
            a.crossJoin(b)
            .where(F.col("a") < F.col("b"))
            .select("a", "b", F.round(cos, 6).alias("cos_sim"))
            .where(F.col("cos_sim") >= threshold)
        )
    if dim is None:
        dim = len(e.select(vec_col).first()[0])
    banded = e.select(F.col(id_col).alias("doc"), F.col(vec_col).alias("v"))
    keys = []
    for band in range(n_bands):
        planes = random_hyperplanes(dim, n_planes, seed + 1000 * band)
        sig = None
        for p in planes:
            arr = F.array(*[F.lit(float(x)) for x in p])
            bit = (_dot(F.col("v"), arr) > 0).cast("int")
            sig = bit if sig is None else sig * 2 + bit
        keys.append(F.struct(F.lit(band).alias("band"), sig.alias("key")))
    banded = banded.select("doc", "v", F.explode(F.array(*keys)).alias("bk")).select(
        "doc", "v", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    # the n_bands x n_planes projection stage is the expensive part and
    # feeds BOTH sides of the self-join — cache the one shared table so it
    # computes once per action instead of twice
    banded = banded.persist()
    a = banded.select(F.col("doc").alias("a"), F.col("v").alias("av"), "band", "key")
    b = banded.select(F.col("doc").alias("b"), F.col("v").alias("bv"), "band", "key")
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "av", "bv")
        .dropDuplicates(["a", "b"])
    )
    return (
        cand.select("a", "b", F.round(cos, 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def ivf_train(
    embeddings: DataFrame, n_cells=16, id_col="vec_id", vec_col="embedding",
    seed=42, iters=8, sample_size=None,
) -> np.ndarray:
    """Train an IVF coarse codebook: deterministic hash-ordered sample to
    the driver (sample-based k-means is the standard codebook recipe —
    the full table never leaves the cluster), then Lloyd iterations in
    NumPy.  Initial centroids are the first ``n_cells`` sampled vectors,
    so the result is reproducible for a given seed."""
    sample_size = sample_size or max(n_cells * 64, 1024)
    pdf = (
        embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id").cast("long"), F.lit(int(seed))), F.col("id"))
        .limit(sample_size)
        .toPandas()
    )
    X = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
    if len(X) < n_cells:
        raise ValueError(f"need at least n_cells={n_cells} vectors, got {len(X)}")
    cents = X[:n_cells].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for c in range(n_cells):
            m = assign == c
            if m.any():
                cents[c] = X[m].mean(0)
    return cents


def ivf_assign(
    embeddings: DataFrame, n_cells=16, seed=42, id_col="vec_id", vec_col="embedding",
    dim=None, centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF coarse assignment: nearest centroid of a trained codebook
    (:func:`ivf_train` unless ``centroids`` is given).

    The codebook ships as a BROADCAST DataFrame — one (cell, cvec) row
    per centroid — never as literal arrays inlined into the expression
    tree (which grows the plan by n_cells × dim literals and breaks down
    around dim 512 × 256 cells).  Each vector meets every centroid via
    the broadcast cross join; the per-vector argmin is a map-side
    partial ``min(struct(dist, cell))``, so the shuffle is one row per
    vector regardless of n_cells."""
    import pandas as pd

    if centroids is None:
        centroids = ivf_train(embeddings, n_cells, id_col, vec_col, seed)
    spark = embeddings.sparkSession
    cdf = spark.createDataFrame(
        pd.DataFrame({
            "cell": np.arange(len(centroids), dtype=np.int32),
            "cvec": [[float(x) for x in c] for c in centroids],
        })
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col), F.col("cvec"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    assign = (
        embeddings.select(F.col(id_col).alias("_ivf_id"), F.col(vec_col).alias(vec_col))
        .crossJoin(F.broadcast(cdf))
        .withColumn("_d", d2)
        .groupBy("_ivf_id")
        .agg(F.min(F.struct(F.col("_d"), F.col("cell"))).alias("best"))
        .select(F.col("_ivf_id"), F.col("best.cell").alias("cell"))
    )
    return embeddings.join(
        assign, embeddings[id_col] == assign["_ivf_id"]
    ).drop("_ivf_id")


def ivf_topk(
    embeddings: DataFrame, queries: DataFrame, k=10, n_cells=16, n_probe=2,
    seed=42, id_col="vec_id", vec_col="embedding", centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: the 100-TB ANN search path completing
    :func:`ivf_train`/:func:`ivf_assign`.

    Base vectors are coarse-assigned once (nearest centroid); each query
    probes its ``n_probe`` nearest cells and rescored candidates are ONLY
    the base vectors in those cells — an equality join on ``cell``
    (linear shuffle, no cross join against the base table).  The query ×
    centroid ranking is a broadcast cross join on the tiny query side.
    Returns (query_id, neighbor_id, cos_sim, rank); recall rises with
    ``n_probe`` (n_probe = n_cells degrades to exact search).
    """
    import pandas as pd

    if centroids is None:
        centroids = ivf_train(embeddings, n_cells, id_col, vec_col, seed)
    spark = embeddings.sparkSession
    cdf = spark.createDataFrame(
        pd.DataFrame({
            "cell": np.arange(len(centroids), dtype=np.int32),
            "cvec": [[float(x) for x in c] for c in centroids],
        })
    )
    base = ivf_assign(embeddings, id_col=id_col, vec_col=vec_col, centroids=centroids) \
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), "cell")
    d2 = F.aggregate(
        F.zip_with(
            F.col("qv"), F.col("cvec"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("_d"), F.asc("cell"))
    probes = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .crossJoin(F.broadcast(cdf))
        .withColumn("_d", d2)
        .withColumn("_pr", F.row_number().over(wq))
        .where(F.col("_pr") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    cos = _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv")))
    scored = (
        base.join(F.broadcast(probes), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cos, 6).alias("cos_sim"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def embedding_clusters(
    spark, embeddings: DataFrame, threshold=0.85, id_col="vec_id",
    vec_col="embedding", method="modularity", gamma=1.0, seed=42,
    n_planes=8, n_bands=4, **leiden_kw,
) -> DataFrame:
    """Semantic clusters over an embedding column: LSH-banded near-dup
    pairs become a similarity graph and Leiden groups it — the standard
    "semantic dedup / topic bucketing" pipeline for training-data curation,
    end-to-end in two of this engine's own operators.

    Scale shape: the pair generation is the banded equality join of
    :func:`embedding_neardup_pairs` (never a cross join), the graph is
    pairs-proportional (sparse — only cos >= threshold edges exist), and
    :func:`leidenalg_spark.operators.leiden.leiden` handles it at any
    size (distributed supersteps above ``local_threshold``).  Vectors
    with no neighbour at the threshold come back as singleton clusters
    labelled by their own id.

    Returns (id_col, cluster: long).
    """
    from .leiden import leiden

    pairs = embedding_neardup_pairs(
        embeddings, threshold=threshold, id_col=id_col, vec_col=vec_col,
        n_planes=n_planes, n_bands=n_bands, seed=seed,
    )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"),
        F.col("cos_sim").alias("weight"),
    ).persist()
    if edges.count() == 0:
        # no pair reaches the threshold: every vector is its own cluster
        edges.unpersist()
        return embeddings.select(
            F.col(id_col), F.col(id_col).cast("long").alias("cluster")
        )
    res = leiden(spark, edges, method=method, gamma=gamma, seed=seed, **leiden_kw)
    # Leiden's labels are dense 0..k-1 — a different label space from the
    # vec_ids that label singleton clusters below, so relabel every
    # community to its minimum member id (collision-free: a cluster label
    # is then always a vec_id that belongs to that cluster, and a
    # singleton's own id belongs to no multi-member cluster)
    labels = res.membership.groupBy("comm").agg(F.min("id").alias("cluster"))
    memb = res.membership.join(labels, "comm").select("id", "cluster")  # AQE broadcasts when small
    return (
        embeddings.select(F.col(id_col).alias("id"))
        .join(memb, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("cluster", F.col("id")).alias("cluster"),
        )
    )


# ------------------------------------------------------- embedding stats
def embedding_covariance(
    embeddings: DataFrame, vec_col="embedding", id_col="vec_id"
) -> DataFrame:
    """Population covariance matrix of the embedding columns — the
    distributed statistics pass under PCA/whitening.  Returns the upper
    triangle as (i, j, cov) rows (i ≤ j, 0-based dims), cov rounded 6.

    Scale shape: one posexplode (n·d rows) for the means, one per-vector
    pair join (n·d²/2 rows BEFORE map-side partial aggregation — the
    shuffle itself is d²/2 cells per partition, independent of n); the
    d-row mean table broadcasts.  d² cells is the inherent output of a
    covariance; nothing here is quadratic in n.

    Numerics: two-pass CENTERED form ``Σ(x−μ_i)(y−μ_j)/n``, not
    ``E[xy]−μ_i·μ_j``.  The uncentered form subtracts two large
    near-equal numbers, so cross-engine summation-order drift lands at
    the 6th decimal and flips the ROUND boundary (the round-4 driver
    hash-fail); centering shrinks the summands by orders of magnitude
    and makes 6dp rounding engine-stable.  The extra pass is one
    broadcast join of the d-row mean table — free at any scale.
    """
    pos = embeddings.select(
        F.col(id_col).alias("vid"), F.posexplode(vec_col).alias("i", "x")
    ).withColumn("x", F.col("x").cast("double"))
    n1 = embeddings.agg(F.count(F.lit(1)).cast("double").alias("n"))
    mu = (
        pos.groupBy("i").agg(F.sum("x").alias("sx"))
        .crossJoin(F.broadcast(n1))
        .select("i", (F.col("sx") / F.col("n")).alias("mu"))
    )
    cen = pos.join(F.broadcast(mu), "i").select(
        "vid", "i", (F.col("x") - F.col("mu")).alias("cx")
    )
    p1 = cen.select("vid", F.col("i").alias("i"), F.col("cx").alias("cxi"))
    p2 = cen.select("vid", F.col("i").alias("j"), F.col("cx").alias("cxj"))
    sxy = (
        p1.join(p2, "vid")
        .where(F.col("i") <= F.col("j"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("cxi") * F.col("cxj")).alias("sxy"))
    )
    return (
        sxy.crossJoin(F.broadcast(n1))
        .select("i", "j", F.round(F.col("sxy") / F.col("n"), 6).alias("cov"))
    )


def embedding_pca(
    spark, embeddings: DataFrame, k: int = 4, vec_col="embedding", id_col="vec_id"
) -> DataFrame:
    """PCA projection to the top-``k`` principal components: the mean and
    covariance are computed DISTRIBUTED (see
    :func:`embedding_covariance`); only the d×d matrix reaches the
    driver, where NumPy eigendecomposes it (d×d is small by
    construction — the same driver-side-codebook convention as
    :func:`ivf_train`).  Components ship back as a broadcast (comp,
    cvec) table and each projection is a JVM ``zip_with`` dot product.
    Sign convention: each component is flipped so its
    largest-magnitude entry is positive (deterministic output).
    Returns (vec_id, comp, score), comp 0-based by descending
    eigenvalue.
    """
    import pandas as pd

    cov_rows = embedding_covariance(embeddings, vec_col, id_col).collect()
    d = max(r["j"] for r in cov_rows) + 1
    C = np.zeros((d, d))
    for r in cov_rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    mu_pdf = (
        embeddings.select(F.posexplode(vec_col).alias("i", "x"))
        .groupBy("i").agg(F.avg(F.col("x").cast("double")).alias("mu"))
        .toPandas().sort_values("i")
    )
    mu = mu_pdf["mu"].to_numpy()
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, d)
    for c in range(len(comps)):
        if comps[c][np.argmax(np.abs(comps[c]))] < 0:
            comps[c] = -comps[c]
    cdf = spark.createDataFrame(pd.DataFrame({
        "comp": np.arange(len(comps), dtype=np.int32),
        "cvec": [[float(x) for x in (c - 0.0)] for c in comps],
        "coff": [float(np.dot(c, mu)) for c in comps],
    }))
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("cvec"),
                   lambda x, y: x.cast("double") * y),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    return (
        embeddings.select(id_col, vec_col)
        .crossJoin(F.broadcast(cdf))
        .select(
            id_col, "comp",
            F.round(dot - F.col("coff"), 6).alias("score"),
        )
    )


# ------------------------------------------------------------- k-means
def _kmeans_fit(spark, embeddings, k, iters, seed, id_col, vec_col):
    """Shared Lloyd loop: returns (persisted base table, assign closure,
    final centroids).  Caller must ``base.unpersist()``.  See
    :func:`kmeans_embeddings` for the determinism contract (md5-priority
    init, centroids rounded to 6 decimals at every driver sync)."""
    import pandas as pd

    pr = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("id").cast("string"))), 1, 8
        ),
        16, 10,
    ).cast("long")
    init = (
        embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("_p", pr)
        .orderBy("_p", "id")
        .limit(k)
        .select("v")
        .collect()
    )
    cents = [[round(float(x), 6) for x in r["v"]] for r in init]

    base = embeddings.select(
        F.col(id_col).alias("_km_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).persist()

    def _scored(centroids):
        """Per-(vector, cell) squared distances against a broadcast
        codebook — the shared probe all consumers aggregate from."""
        cdf = spark.createDataFrame(
            pd.DataFrame({
                "cell": list(range(len(centroids))),
                "cv": centroids,
            })
        )
        d2 = F.aggregate(
            F.zip_with(F.col("v"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )
        return base.crossJoin(F.broadcast(cdf)).withColumn("_d2", d2)

    def _assign(centroids):
        return (
            _scored(centroids)
            .groupBy("_km_id")
            .agg(F.min(F.struct(F.col("_d2"), F.col("cell"))).alias("best"))
            .select(
                "_km_id",
                F.col("best.cell").alias("cell"),
                F.col("best._d2").alias("d2"),
            )
        )

    for _ in range(iters):
        assign = _assign(cents)
        upd = (
            assign.join(base, "_km_id")
            .select("cell", F.posexplode("v").alias("i", "x"))
            .groupBy("cell", "i")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in upd:
            by_cell.setdefault(r["cell"], {})[r["i"]] = r["m"]
        cents = [
            [round(by_cell[c][i], 6) for i in sorted(by_cell[c])]
            if c in by_cell
            else cents[c]
            for c in range(k)
        ]

    return base, _scored, _assign, cents


def kmeans_embeddings(
    spark,
    embeddings: DataFrame,
    k: int = 4,
    iters: int = 2,
    seed: int = 42,
    id_col="vec_id",
    vec_col="embedding",
) -> DataFrame:
    """Distributed Lloyd k-means over the FULL embedding table (contrast
    :func:`ivf_train`, which trains a codebook on a driver-side sample).

    - Initial centroids: the ``k`` vectors with the smallest
      md5(seed, id) priority — deterministic and SQL-reproducible,
      never ``rand()`` (the repo-wide sampling convention).
    - Assignment: broadcast the k×d codebook, per-vector nearest
      centroid via a map-side ``min(struct(d2, cell))`` — the
      :func:`ivf_assign` shape, one shuffle row per vector.
    - Update: one posexplode + (cell, dim) hash aggregate (map-side
      combinable); only the k×d centroid matrix reaches the driver
      between iterations, and it is ROUNDED to 6 decimals at that sync —
      the cross-engine determinism barrier that lets a DuckDB oracle
      replay the run bit-for-bit.  Empty cells keep their previous
      centroid.

    Returns (``id_col``, cell, dist) — the assignment against the final
    centroids, euclidean ``dist`` rounded to 6 decimals.
    """
    base, _scored, _assign, cents = _kmeans_fit(
        spark, embeddings, k, iters, seed, id_col, vec_col
    )
    out = _assign(cents).select(
        F.col("_km_id").alias(id_col),
        "cell",
        F.round(F.sqrt("d2"), 6).alias("dist"),
    )
    base.unpersist()
    return out


def kmeans_silhouette(
    spark,
    embeddings: DataFrame,
    k: int = 4,
    iters: int = 2,
    seed: int = 42,
    id_col="vec_id",
    vec_col="embedding",
) -> DataFrame:
    """Per-cell simplified silhouette of the deterministic Lloyd run
    (same init / rounding contract as :func:`kmeans_embeddings`): for
    each vector, ``a`` = distance to its own (nearest) centroid, ``b`` =
    distance to the second-nearest, ``s = (b − a) / max(a, b)`` — the
    centroid-based silhouette (a linear-cost proxy for the O(n²)
    pairwise silhouette, the standard clustering-quality report at
    scale).  Returns one row per cell: ``(cell, n, mean_silhouette)``.

    The best/second-best pair comes out of the SAME per-vector hash
    aggregate as the assignment (a sorted k-element struct array per
    vector, k small by construction) — no second probe pass.
    """
    base, _scored, _assign, cents = _kmeans_fit(
        spark, embeddings, k, iters, seed, id_col, vec_col
    )
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("_d2").alias("d2"), F.col("cell")))
    )
    per_v = (
        _scored(cents)
        .groupBy("_km_id")
        .agg(arr.alias("arr"))
        .select(
            F.col("arr")[0]["cell"].alias("cell"),
            F.sqrt(F.col("arr")[0]["d2"]).alias("a"),
            F.sqrt(F.coalesce(F.col("arr")[1]["d2"], F.col("arr")[0]["d2"])).alias("b"),
        )
    )
    s = F.when(
        F.greatest("a", "b") > 0, (F.col("b") - F.col("a")) / F.greatest("a", "b")
    ).otherwise(F.lit(0.0))
    out = per_v.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg(s), 6).alias("mean_silhouette"),
    )
    out = out.localCheckpoint(eager=True)
    base.unpersist()
    return out


def quantize_embeddings(
    emb: DataFrame,
    col: str = "embedding",
    id_col: str = "vec_id",
    n_levels: int = 127,
) -> DataFrame:
    """Symmetric per-vector int8-style quantization — the standard
    vector-store compression step (scale = max|x| / n_levels, code_i =
    round(x_i / scale)), 4× smaller than float32 at ~0.5% recall cost
    in practice.  Returns the EXPLODED code table
    ``(id, i, code, scale)`` so downstream dot products can run as
    integer arithmetic joins; zero vectors quantize to all-zero codes
    with scale 0.

    Scale shape: one projection (max|x| via ``F.aggregate``, codes via
    ``F.transform``) + one posexplode — whole-stage codegen, no
    shuffle, no Python.
    """
    x = F.col(col)
    mx = F.aggregate(
        x, F.lit(0.0), lambda acc, v: F.greatest(acc, F.abs(v))
    )
    scale = F.round(mx / F.lit(float(n_levels)), 9)
    codes = F.transform(
        x,
        lambda v: F.when(F.col("scale") > 0, F.round(v / F.col("scale"), 0))
        .otherwise(F.lit(0.0))
        .cast("int"),
    )
    return (
        emb.select(F.col(id_col).alias("id"), x.alias(col), scale.alias("scale"))
        .select("id", "scale", F.posexplode(codes).alias("i", "code"))
        .select("id", "i", "code", "scale")
    )


def knn_graph(
    spark,
    embeddings: DataFrame,
    k: int = 5,
    n_planes: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """k-nearest-neighbour graph construction — the bridge from vector
    space into the link-graph engine: the returned weighted edge table
    feeds straight into ``leiden`` / ``label_propagation`` /
    ``connected_components`` for semantic clustering of embeddings.

    Candidates are LSH bucket-mates (sign-of-projection signature over
    ``n_planes`` shared hyperplanes — one equality self-join, never an
    all-pairs cross join); exact cosine ranks within the bucket; each
    vertex keeps its top-k (ties → lower neighbour id); the directed
    k-NN relation is then symmetrised to undirected edges.

    Returns (src, dst, weight, mutual) with src < dst, weight = cosine
    similarity, mutual = true iff each endpoint is in the other's
    top-k (the "mutual-kNN" filter commonly used to suppress hub
    links before clustering).

    Scale shape: the self-join shuffles both sides by the bucket key
    (2^n_planes buckets — pick n_planes ≈ log2(N/avg_bucket) so bucket
    population stays bounded); per-bucket pairing is |bucket|², the
    standard LSH cost; the top-k is one ranked window partitioned by
    vertex; the symmetrise step is a (src,dst)-keyed aggregate.  No
    broadcast of the full table anywhere, so N is unbounded.
    """
    if k < 1:
        raise ValueError("k must be positive")
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = random_hyperplanes(dim, n_planes, seed)
    b = lsh_bucket_ids(embeddings, planes, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "bucket"
    )
    cos = _dot(F.col("x.v"), F.col("y.v")) / (
        _norm(F.col("x.v")) * _norm(F.col("y.v"))
    )
    cand = (
        b.alias("x")
        .join(b.alias("y"), "bucket")
        .where(F.col("x.id") != F.col("y.id"))
        .select(
            F.col("x.id").alias("src0"),
            F.col("y.id").alias("dst0"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("src0").orderBy(F.desc("cos_sim"), F.asc("dst0"))
    knn = cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
    return (
        knn.select(
            F.least("src0", "dst0").alias("src"),
            F.greatest("src0", "dst0").alias("dst"),
            "cos_sim",
        )
        .groupBy("src", "dst")
        .agg(
            F.max("cos_sim").alias("weight"),
            (F.count(F.lit(1)) == 2).alias("mutual"),
        )
    )


def kmeans_outliers(
    spark,
    embeddings: DataFrame,
    k: int = 4,
    iters: int = 2,
    seed: int = 42,
    z_thresh: float = 2.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space outlier scoring — the data-cleaning signal on top
    of the deterministic Lloyd run (:func:`kmeans_embeddings`): each
    vector's distance to its assigned centroid, z-scored against its
    OWN cell's distance distribution; points beyond ``z_thresh`` are
    flagged (mislabeled/garbage embeddings cluster at the cell fringe).

    Returns (vec_id, cell, dist, z, is_outlier); z is NULL (and the
    flag false) in degenerate cells with zero distance spread.

    Scale: the kmeans assignment plan plus ONE |k|-row aggregate
    broadcast back — no extra exchange beyond the fit itself.
    """
    assigned = kmeans_embeddings(
        spark, embeddings, k=k, iters=iters, seed=seed, id_col=id_col, vec_col=vec_col
    )
    stats = assigned.groupBy("cell").agg(
        F.avg("dist").alias("mu"), F.stddev_samp("dist").alias("sd")
    )
    z = F.when(F.col("sd") > 0, (F.col("dist") - F.col("mu")) / F.col("sd"))
    return assigned.join(F.broadcast(stats), "cell").select(
        id_col,
        "cell",
        "dist",
        F.round(z, 6).alias("z"),
        F.coalesce(z >= z_thresh, F.lit(False)).alias("is_outlier"),
    )


def random_projection(
    spark,
    emb: DataFrame,
    k: int = 16,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson–Lindenstrauss random sign projection (Achlioptas 2003,
    "Database-friendly random projections"): y_j = Σ_i x_i·r_ij /√k
    with r_ij ∈ {−1,+1} drawn from the md5 parity of (seed, i, j) —
    the same engine-replayable hash family every sampler here uses.
    Achlioptas's theorem: ±1 entries preserve pairwise distances with
    the same JL guarantee as Gaussian entries, so this is the standard
    cheap dimensionality-reduction front-end for LSH / clustering.
    Returns the exploded projection ``(id, j, y)``.

    Scale shape: the sign matrix is a GENERATED dim×k DataFrame
    (spark.range × spark.range — never driver-side literal arrays, cf.
    the ivf_assign centroid-inlining trap), broadcast into one
    equality join against the posexploded vectors, then a map-side
    combinable (id, j) sum.  At dim=4096, k=64 the broadcast is 262k
    rows — trivially under any broadcast threshold.
    """
    import math

    key = F.md5(
        F.concat(
            F.lit(f"{seed}:"),
            F.col("i").cast("string"),
            F.lit(":"),
            F.col("j").cast("string"),
        )
    )
    signs = (
        spark.range(dim)
        .select(F.col("id").alias("i"))
        .crossJoin(spark.range(k).select(F.col("id").alias("j")))
        .select(
            "i",
            "j",
            (
                1
                - 2
                * (F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % 2)
            ).cast("int").alias("sign"),
        )
    )
    expl = emb.select(
        F.col(id_col).alias("id"), F.posexplode(vec_col).alias("i", "x")
    ).select("id", F.col("i").cast("bigint").alias("i"), F.col("x").cast("double").alias("x"))
    return (
        expl.join(F.broadcast(signs), "i")
        .groupBy("id", "j")
        .agg(
            F.round(F.sum(F.col("x") * F.col("sign")) / F.lit(math.sqrt(k)), 6).alias("y")
        )
    )


def distance_histogram(
    spark,
    emb: DataFrame,
    offsets: tuple = (1, 7, 41, 173),
    n_bins: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine-similarity histogram over a DETERMINISTIC sample of
    vector pairs — the threshold-calibration chart every near-dup /
    ANN pipeline needs before picking a cutoff (where does the
    duplicate mode separate from the background mode?).  Pairs are
    id-offset pairs: each vector pairs with the vectors at
    ``id + offset`` for a handful of coprime strides, giving
    |offsets|·n unbiased pairs without randomness, collection, or a
    quadratic join.  Returns ``(bin, lo, n_pairs, avg_cos)`` where
    ``bin`` = floor(cos·n_bins) clamped to [−n_bins, n_bins−1] and
    ``lo`` = bin/n_bins, over cosine's [−1, 1] range.

    Scale shape: one equality self-join per offset on ``id + offset``
    (a pure co-partitioned merge under the same hash layout — never a
    cross join), JVM ``F.aggregate`` dot products, one bounded
    (≤ 2·n_bins rows) hash aggregate.
    """
    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    shifted = base.select(
        F.col("id").alias("rid"), F.col("v").alias("w"),
        F.explode(F.array(*[F.lit(int(o)) for o in offsets])).alias("off"),
    ).select((F.col("rid") - F.col("off")).alias("id"), "w")
    pairs = base.join(shifted, "id")
    cos = (_dot(F.col("v"), F.col("w")) / (_norm(F.col("v")) * _norm(F.col("w")))).alias("cos")
    binned = pairs.select(cos).select(
        F.greatest(
            F.lit(-n_bins),
            F.least(F.lit(n_bins - 1), F.floor(F.col("cos") * n_bins).cast("long")),
        ).alias("bin"),
        "cos",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.avg("cos"), 6).alias("avg_cos"),
        )
        .select("bin", F.round(F.col("bin") / F.lit(float(n_bins)), 6).alias("lo"), "n_pairs", "avg_cos")
    )


def centroid_classify(
    spark,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-class-centroid classification (Rocchio classifier) over a
    labelled embedding table, reported as the confusion matrix — the
    standard embedding-quality probe (how linearly separable are the
    labels?).  Per-label mean vectors are TRAINED from the data (cf.
    the ivf_train path; never random, never driver literals), every
    vector is assigned to the closest centroid by squared L2, and the
    output is ``(label, pred_label, n)``.  Distances round to 9dp with
    label tie-breaks, so the argmin is deterministic and
    engine-portable.

    Scale shape: centroids = one (label, dim) mean aggregate — k·dim
    rows, broadcast; scoring = posexplode ⋈ broadcast-centroids →
    (id, candidate) partial-sum aggregate, O(n·dim·k) rows streamed
    through map-side combine with k = |labels| bounded; the argmin is
    a (rounded-dist, label) min-struct per id, no window; the
    confusion matrix is a k²-cell hash agg.
    """
    x = emb.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("lbl"),
        F.posexplode(vec_col).alias("i", "v"),
    ).select("id", "lbl", "i", F.col("v").cast("double").alias("v"))
    cent = (
        x.groupBy(F.col("lbl").alias("cand"), "i")
        .agg(F.round(F.avg("v"), 9).alias("c"))
    )
    dists = (
        x.join(F.broadcast(cent), "i")
        .groupBy("id", "lbl", "cand")
        .agg(
            F.round(F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))), 9)
            .alias("dist")
        )
    )
    pred = dists.groupBy("id", "lbl").agg(
        F.min(F.struct("dist", "cand")).alias("m")
    ).select("lbl", F.col("m.cand").alias("pred"))
    return (
        pred.groupBy(F.col("lbl").alias("label"), F.col("pred").alias("pred_label"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def kcenter_coreset(
    spark,
    emb: DataFrame,
    k: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center coreset (Gonzalez 1985, the 2-approximation):
    seed with the minimum id, then ``k−1`` times pick the vector
    FARTHEST from every chosen center — the classic diversity /
    coverage sampler for training-data selection (maximally spread
    exemplars, the opposite failure mode of random sampling).
    Returns ``(rnd, center_id, radius)`` where ``radius`` is the
    chosen point's L2 distance to its nearest earlier center — the
    non-increasing k-center objective curve (seed radius 0).

    Determinism: distances round to 9dp and the argmax tie-breaks on
    id, so the trajectory is engine-portable.

    Scale shape: per round ONE broadcast of the single chosen center
    row into a zip_with L2 update of the (id, min_dist) state and one
    TakeOrdered(1) selection — k bounded, state linear in n, lineage
    truncated per round; never a pairwise matrix.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).persist()
    seed_id = base.agg(F.min("id")).first()[0]
    seed = base.where(F.col("id") == seed_id)

    def _l2(a, b):
        return F.sqrt(
            F.aggregate(
                F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
                F.lit(0.0),
                lambda acc, z: acc + z,
            )
        )

    picks = [seed.select(F.lit(0).cast("long").alias("rnd"),
                         F.col("id").alias("center_id"),
                         F.lit(0.0).alias("radius"))]
    cb = F.broadcast(seed.select(F.col("v").alias("cv")))
    state = base.crossJoin(cb).select(
        "id", "v", F.round(_l2(F.col("v"), F.col("cv")), 9).alias("md")
    ).localCheckpoint(eager=True)
    for r in range(1, k):
        sel = state.orderBy(F.col("md").desc(), "id").limit(1).localCheckpoint(eager=True)
        picks.append(
            sel.select(
                F.lit(r).cast("long").alias("rnd"),
                F.col("id").alias("center_id"),
                F.round("md", 6).alias("radius"),
            )
        )
        if r < k - 1:
            cb = F.broadcast(sel.select(F.col("v").alias("cv")))
            state = state.crossJoin(cb).select(
                "id",
                "v",
                F.least(F.col("md"), F.round(_l2(F.col("v"), F.col("cv")), 9)).alias("md"),
            ).localCheckpoint(eager=True)
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    out = out.localCheckpoint(eager=True)
    base.unpersist()
    return out


def embedding_drift(
    vecs: DataFrame, split_col, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension distribution drift between two embedding cohorts —
    the monitoring primitive that catches encoder version skew or a
    shifted data mix before it poisons retrieval: standardized mean
    difference per dimension

        smd_d = (mean_B[d] − mean_A[d]) / pooled_std[d]

    ``split_col``: boolean Column (False → cohort A / reference, True →
    cohort B / current).  Returns one row per dimension (dim, mean_a,
    mean_b, std_pooled, smd), |dims| rows total.

    Scale shape: posexplode fans each vector into |dims| rows and ONE
    hash aggregate on (dim, cohort) reduces them map-side — state is
    2·|dims| cells per task regardless of row count; the final pivot
    and smd arithmetic run on a |dims|-row table.
    """
    ex = vecs.select(
        split_col.cast("int").alias("g"), F.posexplode(vec_col).alias("dim", "v")
    )
    cell = ex.groupBy("dim", "g").agg(
        F.avg("v").alias("mu"), F.var_samp("v").alias("s2"), F.count(F.lit(1)).alias("n")
    )
    piv = cell.groupBy("dim").pivot("g", [0, 1]).agg(
        F.first("mu").alias("mu"), F.first("s2").alias("s2"), F.first("n").alias("n")
    )
    pooled = F.sqrt(
        ((F.col("0_n") - 1) * F.col("0_s2") + (F.col("1_n") - 1) * F.col("1_s2"))
        / (F.col("0_n") + F.col("1_n") - 2)
    )
    return piv.select(
        F.col("dim").cast("long").alias("dim"),
        F.round("0_mu", 6).alias("mean_a"),
        F.round("1_mu", 6).alias("mean_b"),
        F.round(pooled, 6).alias("std_pooled"),
        F.round(
            F.when(pooled > 0, (F.col("1_mu") - F.col("0_mu")) / pooled), 6
        ).alias("smd"),
    )


def label_centroid_sim(vecs: DataFrame, label_col: str = "label", vec_col: str = "embedding") -> DataFrame:
    """Pairwise cosine similarity between per-label embedding centroids —
    the label-space confusion map: two labels whose centroids nearly
    coincide are candidates for merging (or for a mislabelled split).
    Returns (label_a, label_b, cos_sim) for label_a < label_b.

    Scale shape: posexplode → ONE (label, dim) hash aggregate (combiner
    state = |labels|·|dims| cells); the pair matrix is a self-join on
    dim over a |labels|·|dims| table — never touches raw vectors twice.
    """
    cent = (
        vecs.select(F.col(label_col).alias("l"), F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("l", "dim")
        .agg(F.avg("v").alias("m"))
    )
    a = cent.select(F.col("l").alias("label_a"), "dim", F.col("m").alias("ma"))
    b = cent.select(F.col("l").alias("label_b"), "dim", F.col("m").alias("mb"))
    return (
        a.join(b, "dim")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.round(
                F.sum(F.col("ma") * F.col("mb"))
                / (
                    F.sqrt(F.sum(F.col("ma") * F.col("ma")))
                    * F.sqrt(F.sum(F.col("mb") * F.col("mb")))
                ),
                6,
            ).alias("cos_sim")
        )
    )


def intrinsic_dim(
    vecs: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id",
    neighbors: DataFrame | None = None,
) -> DataFrame:
    """Levina–Bickel two-NN intrinsic-dimension estimate (Facco et al.
    2017): with r1 ≤ r2 the two nearest Euclidean distances per point,

        d ≈ n / Σ ln(r2 / r1)

    — the "how many degrees of freedom does this embedding actually
    use" scalar that flags collapsed or under-trained encoders long
    before retrieval quality shows it.  Returns one row
    (n_points, mean_log_ratio, intrinsic_dim).

    By default distances come from an EXACT all-pairs pass — quadratic,
    for validation scale only; at web scale pass ``neighbors`` (e.g.
    the LSH-bucketed :func:`knn_graph` output with ≥2 neighbours per
    point, columns (src, dst, dist)) and the estimator runs on that
    linear-size table instead.
    """
    if neighbors is None:
        # double-cast BEFORE the subtraction so the arithmetic matches any
        # float64 re-implementation bit-for-bit (float32 subtract-then-
        # widen rounds differently)
        a = vecs.select(
            F.col(id_col).alias("src"), F.col(vec_col).cast("array<double>").alias("va")
        )
        b = vecs.select(
            F.col(id_col).alias("dst"), F.col(vec_col).cast("array<double>").alias("vb")
        )
        neighbors = (
            a.crossJoin(b)
            .where(F.col("src") != F.col("dst"))
            .select(
                "src", "dst",
                F.sqrt(
                    F.aggregate(
                        F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
                        F.lit(0.0),
                        lambda s, x: s + x,
                    )
                ).alias("dist"),
            )
        )
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy(F.col("dist").asc(), F.col("dst").asc())
    two = neighbors.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 2)
    ratio = (
        two.groupBy("src")
        .agg(
            F.max(F.when(F.col("rk") == 1, F.col("dist"))).alias("r1"),
            F.max(F.when(F.col("rk") == 2, F.col("dist"))).alias("r2"),
        )
        .where(F.col("r1") > 0)
        .where(F.col("r2").isNotNull())
        .select(F.log(F.col("r2") / F.col("r1")).alias("lr"))
    )
    return ratio.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.round(F.avg("lr"), 6).alias("mean_log_ratio"),
        F.round(F.count(F.lit(1)) / F.sum("lr"), 6).alias("intrinsic_dim"),
    )


def fisher_ratio(vecs: DataFrame, label_col: str = "label", vec_col: str = "embedding") -> DataFrame:
    """Per-dimension Fisher discriminant ratio — between-class variance
    of the label means over mean within-class variance:

        F_d = Var_labels(μ_{l,d}) / mean_labels(σ²_{l,d})

    the dimension-level "does this axis separate the labels at all"
    score (the diagonal ingredient of LDA).  Near-0 dimensions carry no
    label signal and are pruning candidates.  Returns
    (dim, between_var, within_var, fisher).

    Scale shape: posexplode → ONE (label, dim) hash aggregate
    (|labels|·|dims| combiner cells), then the ratio runs on that tiny
    table — raw vectors are scanned once.
    """
    ex = vecs.select(
        F.col(label_col).alias("l"), F.posexplode(vec_col).alias("dim", "v")
    )
    cell = ex.groupBy("l", "dim").agg(
        F.avg("v").alias("mu"), F.var_samp("v").alias("s2")
    )
    agg = cell.groupBy("dim").agg(
        F.var_samp("mu").alias("between_var"),
        F.avg("s2").alias("within_var"),
    )
    return agg.select(
        F.col("dim").cast("long").alias("dim"),
        F.round("between_var", 6).alias("between_var"),
        F.round("within_var", 6).alias("within_var"),
        F.round(
            F.when(F.col("within_var") > 0, F.col("between_var") / F.col("within_var")),
            6,
        ).alias("fisher"),
    )


def hard_negatives(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive / metric-learning training
    sets: for every query (anchor) vector, the top-k most-similar vectors
    carrying a DIFFERENT label — the negatives closest to the decision
    boundary, which dominate the gradient signal in triplet/InfoNCE
    losses (Schroff et al., FaceNet; common retrieval practice).

    Returns (query_id, neighbor_id, neighbor_label, cos_sim, rank),
    rank 1..k per query, deterministic ties (cos desc, neighbor_id asc).

    Scale shape: anchors arrive per training batch, so the query side is
    small and broadcast — one scan of the corpus, JVM-side ``F.aggregate``
    dot products, a bounded per-anchor window.  For whole-corpus mining
    route the corpus through :func:`lsh_bucket_ids` and run this within
    buckets, trading recall for the linear shuffle (same trade as
    :func:`lsh_cosine_topk`).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col(label_col).alias("qlab"),
    )
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        F.col(label_col).alias("neighbor_label"),
    )
    cos = _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv")))
    scored = (
        base.crossJoin(F.broadcast(q))
        .where(F.col("qlab") != F.col("neighbor_label"))
        .select(
            "query_id", "neighbor_id", "neighbor_label",
            F.round(cos, 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def semantic_dedup(
    spark,
    embeddings: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold: float = 0.9,
    seed: int = 42,
    id_col="vec_id",
    vec_col="embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embeddings, then mark as
    duplicates items whose cosine to a LOWER-id member of the SAME
    cluster exceeds ``threshold`` — the quadratic pair search runs only
    within a cluster, never across the corpus.  Keep policy is greedy
    first-wins in id order (deterministic, engine-reproducible):
    ``dup_of`` = the most-similar lower-id in-cluster match (ties to the
    smallest id), NULL for survivors.

    Returns (``id_col``, cell, dup_of, cos_sim, is_dup) — one row per
    vector; ``WHERE NOT is_dup`` is the deduplicated corpus.

    Contrast :func:`embedding_clusters` (LSH-pair graph + Leiden = topic
    bucketing): this one answers "which rows do I DROP", with the paper's
    cluster-bounded cost model.

    Scale shape: the Lloyd assignment is one broadcast-codebook pass
    (:func:`kmeans_embeddings`); the pair stage is a cell-keyed self-join
    — quadratic ONLY within a cell, so ``k`` should grow with the corpus
    (the paper's ~n/1000 regime) to bound cells; the per-item argmax is
    one bounded window.  No driver loop beyond the k·d centroid syncs.
    """
    asg = kmeans_embeddings(
        spark, embeddings, k=k, iters=iters, seed=seed, id_col=id_col, vec_col=vec_col
    ).select(F.col(id_col).alias("vid"), "cell")
    e = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    ).join(asg, "vid")
    a = e.select(F.col("vid").alias("dup_of"), F.col("v").alias("av"), "cell")
    b = e.select(F.col("vid").alias("vid"), F.col("v").alias("bv"), "cell")
    cos = _dot(F.col("av"), F.col("bv")) / (_norm(F.col("av")) * _norm(F.col("bv")))
    pairs = (
        a.join(b, "cell")
        .where(F.col("dup_of") < F.col("vid"))
        .select("vid", "cell", "dup_of", F.round(cos, 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= float(threshold))
    )
    w = Window.partitionBy("vid").orderBy(F.desc("cos_sim"), F.asc("dup_of"))
    best = (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vid", "dup_of", "cos_sim")
    )
    return (
        asg.join(best, "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            F.col("cell").cast("long").alias("cell"),
            "dup_of",
            "cos_sim",
            F.col("dup_of").isNotNull().alias("is_dup"),
        )
    )


def knn_label_noise(
    embeddings: DataFrame,
    k: int = 10,
    flag_threshold: float = 0.5,
    id_col="vec_id",
    vec_col="embedding",
    label_col="label",
    neighbors: DataFrame | None = None,
    max_id=None,
) -> DataFrame:
    """Neighborhood label-agreement noise score (the k-NN heart of
    confident-learning / deep-kNN label audits): for every labelled
    vector, the fraction of its k nearest cosine neighbours whose label
    DISAGREES with its own — items whose neighbourhood votes against
    their label are likely mislabelled (or sit on a class boundary).

    Returns (``id_col``, label, n_neighbors, n_agree, noise_score,
    flagged) with noise_score = 1 − agree/k and ``flagged`` when the
    score ≥ ``flag_threshold`` (majority disagreement by default).

    Scale shape: by default the neighbour lists come from the exact
    :func:`cosine_topk` (broadcast query side — validation scale, or a
    bounded ``max_id`` block); at corpus scale pass ``neighbors`` = the
    LSH-bucketed :func:`knn_graph` output ((query_id, neighbor_id, …))
    and this function is two id-keyed label joins + one per-item hash
    aggregate — linear, no pairwise stage.
    """
    e = embeddings
    if max_id is not None:
        e = e.where(F.col(id_col) < max_id)
    nb = neighbors if neighbors is not None else cosine_topk(
        e, e, k=k, id_col=id_col, vec_col=vec_col
    )
    own = e.select(F.col(id_col).alias("query_id"), F.col(label_col).alias("own_label"))
    nlab = e.select(F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nb_label"))
    agg = (
        nb.join(own, "query_id").join(nlab, "neighbor_id")
        .groupBy("query_id", "own_label")
        .agg(
            F.count(F.lit(1)).alias("n_neighbors"),
            F.sum((F.col("nb_label") == F.col("own_label")).cast("long")).alias("n_agree"),
        )
    )
    noise = 1.0 - F.col("n_agree") / F.col("n_neighbors")
    return agg.select(
        F.col("query_id").alias(id_col),
        F.col("own_label").alias(label_col),
        "n_neighbors",
        "n_agree",
        F.round(noise, 6).alias("noise_score"),
        (F.round(noise, 6) >= float(flag_threshold)).alias("flagged"),
    )


def dim_truncation_fidelity(
    spark,
    emb: DataFrame,
    dims: tuple = (8, 16, 32),
    offsets: tuple = (1, 7, 41, 173),
    id_col="vec_id",
    vec_col="embedding",
) -> DataFrame:
    """Matryoshka-style dimension-truncation fidelity: over the SAME
    deterministic id-offset pair sample as :func:`distance_histogram`,
    compare each pair's full-dimension cosine with its first-``d``-dims
    cosine for every ``d`` in ``dims`` — per d, report the Pearson
    correlation and mean absolute error between the two similarity
    scores.  The "can I keep only the first d dims" calibration table:
    high correlation at small d means the index (ANN, dedup, retrieval)
    can run truncated at a fraction of the memory.  Returns
    (dim, n_pairs, pearson_r, mae).

    Scale shape: |offsets|·n pairs (no sampling RNG, no crossJoin);
    per-pair work is |dims|+1 JVM ``aggregate`` dot products over
    sliced arrays; the rollup is one |dims|-row hash aggregate.
    """
    e = emb.select(F.col(id_col).alias("a"), F.col(vec_col).alias("av"))
    pairs = None
    for off in offsets:
        p = e.join(
            emb.select(
                (F.col(id_col) - F.lit(int(off))).alias("a"),
                F.col(vec_col).alias("bv"),
            ),
            "a",
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    full = _dot(F.col("av"), F.col("bv")) / (_norm(F.col("av")) * _norm(F.col("bv")))
    rows = []
    base = pairs.withColumn("cf", F.round(full, 6))
    for d in dims:
        sa, sb = F.slice("av", 1, int(d)), F.slice("bv", 1, int(d))
        ct = _dot(sa, sb) / (_norm(sa) * _norm(sb))
        rows.append(
            base.select(F.lit(int(d)).alias("dim"), "cf", F.round(ct, 6).alias("ct"))
        )
    allr = rows[0]
    for r in rows[1:]:
        allr = allr.unionByName(r)
    agg = allr.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.avg("cf").alias("mf"), F.avg("ct").alias("mt"),
        F.avg(F.col("cf") * F.col("ct")).alias("mft"),
        F.avg(F.col("cf") * F.col("cf")).alias("mff"),
        F.avg(F.col("ct") * F.col("ct")).alias("mtt"),
        F.avg(F.abs(F.col("cf") - F.col("ct"))).alias("mae"),
    )
    cov = F.col("mft") - F.col("mf") * F.col("mt")
    vf = F.col("mff") - F.col("mf") * F.col("mf")
    vt = F.col("mtt") - F.col("mt") * F.col("mt")
    return agg.select(
        F.col("dim").cast("long").alias("dim"), "n_pairs",
        F.round(F.when((vf > 0) & (vt > 0), cov / F.sqrt(vf * vt)), 6).alias("pearson_r"),
        F.round("mae", 6).alias("mae"),
    )


def label_separation_auc(
    spark,
    emb: DataFrame,
    offsets: tuple = (1, 7, 41, 173),
    id_col="vec_id",
    vec_col="embedding",
    label_col="label",
) -> DataFrame:
    """Label-separability AUC of an embedding space: over the
    deterministic id-offset pair sample (the :func:`distance_histogram`
    convention), the probability that a SAME-label pair scores higher
    cosine than a DIFFERENT-label pair — the Mann–Whitney U / ROC-AUC of
    "is this pair same-class" ranked by similarity, with the standard
    midrank tie correction.  0.5 = labels invisible to the geometry,
    1.0 = perfectly separated; the single-number screening twin of
    :func:`fisher_ratio` (which scores dimensions, not pair ranking).
    Returns one row: (n_pairs, n_same, n_diff, auc).

    Scale shape: |offsets|·n pairs, no RNG, no crossJoin; midranks come
    from two global cumulative windows over the pair scores (bounded by
    the pair sample, not the corpus), then one 1-row aggregate.
    """
    e = emb.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("av"), F.col(label_col).alias("la")
    )
    pairs = None
    for off in offsets:
        p = e.join(
            emb.select(
                (F.col(id_col) - F.lit(int(off))).alias("a"),
                F.col(vec_col).alias("bv"),
                F.col(label_col).alias("lb"),
            ),
            "a",
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    cs = _dot(F.col("av"), F.col("bv")) / (_norm(F.col("av")) * _norm(F.col("bv")))
    scored = pairs.select(
        F.round(cs, 6).alias("cs"),
        (F.col("la") == F.col("lb")).cast("int").alias("pos"),
    )
    # midrank = rank() + (#ties − 1)/2: rank() yields 1 + #strictly-below
    # (the min rank of a tie group), so adding half the tie-group excess
    # gives the Mann–Whitney average rank — engine-portable (RANGE frames
    # are value-offset-based in both engines, NOT "strictly below")
    wr = Window.orderBy("cs")
    weq = Window.partitionBy("cs")
    ranked = scored.select(
        "pos",
        (
            F.rank().over(wr) + (F.count(F.lit(1)).over(weq) - 1.0) / 2.0
        ).alias("r"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("pos").alias("n_same"),
        F.sum(F.when(F.col("pos") == 1, F.col("r"))).alias("rsum"),
    )
    n_same = F.col("n_same").cast("double")
    n_diff = (F.col("n_pairs") - F.col("n_same")).cast("double")
    auc = (F.col("rsum") - n_same * (n_same + 1.0) / 2.0) / (n_same * n_diff)
    return agg.select(
        "n_pairs",
        F.col("n_same").cast("long").alias("n_same"),
        (F.col("n_pairs") - F.col("n_same")).cast("long").alias("n_diff"),
        F.round(F.when((n_same > 0) & (n_diff > 0), auc), 6).alias("auc"),
    )


def rrf_fuse(
    rankings: list,
    k: int = 60,
    topk: int = 10,
    query_col: str = "query_id",
    doc_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal rank fusion (Cormack–Clarke–Buettcher, SIGIR 2009):
    combine any number of per-query rankings into one by summing
    1/(k + rank) across lists — the score-free fusion that beats most
    learned combinations and needs NO calibration between rankers
    (cosine indexes, BM25, truncated-dim shortlists, LSH candidates all
    speak "rank").  A document missing from a list simply contributes
    nothing — no imputation.  Ties in the fused score break by doc id.
    Returns (query_col, doc_col, rrf_score, rank) with rank ≤ ``topk``.

    Scale shape: one union of the (already small) per-query top-k
    tables, one (query, doc) hash aggregate, one per-query window over
    ≤ Σ list depths rows — fusion cost is output-proportional, never
    corpus-proportional.
    """
    if not rankings:
        raise ValueError("at least one ranking required")
    parts = [
        r.select(
            F.col(query_col).alias("q"), F.col(doc_col).alias("d"),
            (1.0 / (F.lit(float(k)) + F.col(rank_col))).alias("sc"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("q", "d").agg(F.round(F.sum("sc"), 6).alias("rrf_score"))
    w = Window.partitionBy("q").orderBy(F.desc("rrf_score"), F.asc("d"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(topk))
        .select(
            F.col("q").alias(query_col), F.col("d").alias(doc_col),
            "rrf_score", F.col("rank").cast("long").alias("rank"),
        )
    )


def retrieval_ndcg(
    spark,
    emb: DataFrame,
    k: int = 10,
    max_id=200,
    id_col="vec_id",
    vec_col="embedding",
    label_col="label",
) -> DataFrame:
    """nDCG@k of label retrieval by cosine: treat every vector (in the
    bounded id block) as a query, its same-label neighbours as the
    relevant set, and score the exact top-k cosine ranking with the
    standard log2 discount — DCG@k / IDCG@k where IDCG assumes the
    min(k, #relevant-retrievable) best arrangement.  The RANKED-ORDER
    embedding-quality eval completing the trio: recall (coverage),
    AUC (pairwise order), nDCG (position-weighted order).  Queries with
    no same-label neighbour in the block are dropped (IDCG undefined).
    Returns one row: (n_queries, k, mean_ndcg).

    Scale shape: the exact top-k is the broadcast-query cosine_topk on
    the bounded block (at corpus scale substitute the LSH
    :func:`knn_graph` output); gains/discounts are per-(query, rank)
    column arithmetic; one final 1-row mean.
    """
    e = emb
    if max_id is not None:
        e = e.where(F.col(id_col) < max_id)
    nb = cosine_topk(e, e, k=k, id_col=id_col, vec_col=vec_col)
    own = e.select(F.col(id_col).alias("query_id"), F.col(label_col).alias("ql"))
    nlab = e.select(F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nl"))
    dcg = (
        nb.join(own, "query_id").join(nlab, "neighbor_id")
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("ql") == F.col("nl"), 1.0 / F.log2(F.col("rank") + 1.0))
                .otherwise(F.lit(0.0))
            ).alias("dcg")
        )
    )
    # relevant-retrievable count per query = same-label others in the block
    sizes = (
        own.join(e.select(F.col(label_col).alias("ql")).groupBy("ql")
                 .agg(F.count(F.lit(1)).alias("n_l")), "ql")
        .select("query_id", (F.col("n_l") - 1).alias("n_rel"))
    )
    # IDCG for r relevant in top-k: Σ_{i=1..min(r,k)} 1/log2(i+1), via a
    # k-row cumulative helper cum[i] = Σ_{j<=i} 1/log2(j+1)
    cum = (
        spark.range(1, k + 1)
        .select(F.col("id").alias("i"), (1.0 / F.log2(F.col("id") + 1.0)).alias("g"))
        .withColumn(
            "idcg",
            F.sum("g").over(
                Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .select("i", "idcg")
    )
    per = (
        dcg.join(sizes, "query_id")
        .where(F.col("n_rel") >= 1)
        .join(
            F.broadcast(cum),
            F.least(F.col("n_rel"), F.lit(k)) == F.col("i"),
        )
        .select("query_id", (F.col("dcg") / F.col("idcg")).alias("ndcg"))
    )
    return per.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.lit(int(k)).alias("k"),
        F.round(F.avg("ndcg"), 6).alias("mean_ndcg"),
    )


def kmeans_elbow(
    spark,
    embeddings: DataFrame,
    ks: tuple = (2, 4, 8),
    iters: int = 2,
    seed: int = 42,
    id_col="vec_id",
    vec_col="embedding",
) -> DataFrame:
    """Elbow sweep for the deterministic Lloyd clustering: total inertia
    (Σ dist², from the same 6-decimal-rounded assignment distances as
    :func:`kmeans_embeddings`) for each candidate ``k`` — the standard
    "pick k where the curve bends" diagnostic, engine-reproducible
    because every run shares the md5-priority init and rounding
    contract.  Returns one row per k: (k, n_vectors, inertia,
    mean_dist).

    Scale shape: one independent Lloyd fit per candidate k (each a
    broadcast-codebook scan per iteration); the sweep is |ks| fits —
    embarrassingly sequential driver-side, each fully distributed.
    """
    outs = []
    for k in ks:
        asg = kmeans_embeddings(
            spark, embeddings, k=int(k), iters=iters, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
        outs.append(
            asg.agg(
                F.lit(int(k)).alias("k"),
                F.count(F.lit(1)).alias("n_vectors"),
                F.round(F.sum(F.col("dist") * F.col("dist")), 6).alias("inertia"),
                F.round(F.avg("dist"), 6).alias("mean_dist"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def product_quantize(
    spark,
    embeddings: DataFrame,
    m: int = 2,
    k: int = 16,
    iters: int = 2,
    seed: int = 42,
    id_col="vec_id",
    vec_col="embedding",
    dim: int | None = None,
) -> DataFrame:
    """Product quantization (Jégou 2011 — the ANN memory workhorse):
    split each vector into ``m`` contiguous subvectors, run the
    deterministic Lloyd fit per subspace (k codewords each), and emit
    each vector's code tuple plus its reconstruction error — m·log2(k)
    bits replace the float vector, with ``recon_err`` quantifying the
    loss (the IVF-PQ index decides its re-rank depth from exactly this
    number).  Returns (``id_col``, codes array<int> of length m,
    recon_err) with recon_err = √(Σ_sub dist²) over the per-subspace
    assignment distances.

    Scale shape: m independent Lloyd fits over SLICED vectors (the
    slice is a zero-copy column expression, no reshuffle); the code
    assembly is m id-keyed joins of (id, cell, dist) tables — at
    production m, assemble via one groupBy(id) pivot instead.
    """
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    out = None
    for j in range(m):
        sliced = embeddings.select(
            F.col(id_col), F.slice(vec_col, j * sub + 1, sub).alias(vec_col)
        )
        asg = kmeans_embeddings(
            spark, sliced, k=int(k), iters=iters, seed=seed + 101 * j,
            id_col=id_col, vec_col=vec_col,
        ).select(
            id_col, F.col("cell").alias(f"c{j}"),
            (F.col("dist") * F.col("dist")).alias(f"d{j}"),
        )
        out = asg if out is None else out.join(asg, id_col)
    codes = F.array(*[F.col(f"c{j}").cast("int") for j in range(m)])
    err = F.sqrt(sum(F.col(f"d{j}") for j in range(m)))
    return out.select(id_col, codes.alias("codes"), F.round(err, 6).alias("recon_err"))


def embedding_curation(
    spark,
    embeddings: DataFrame,
    k: int = 4,
    iters: int = 2,
    dedup_threshold: float = 0.8,
    knn_k: int = 10,
    noise_threshold: float = 0.5,
    z_thresh: float = 2.0,
    seed: int = 42,
    id_col="vec_id",
    vec_col="embedding",
    label_col="label",
    neighbors: DataFrame | None = None,
) -> DataFrame:
    """Composed embedding-curation funnel — the vector-side twin of
    :func:`leidenalg_spark.operators.pipeline.training_set`: one keep
    decision per vector from three independent screens,

    - ``is_dup``   — :func:`semantic_dedup` (cluster-bounded SemDeDup,
      greedy min-id keep above ``dedup_threshold`` cosine),
    - ``noisy``    — :func:`knn_label_noise` (majority of the ``knn_k``
      nearest neighbours disagree with the label),
    - ``outlier``  — :func:`kmeans_outliers` (cell-fringe distance
      z ≥ ``z_thresh``),

    ``keep = ¬dup ∧ ¬noisy ∧ ¬outlier``.  Composition matters: the three
    screens share ONE deterministic Lloyd fit family (same seed/rounding
    contract), so the whole funnel — not just the parts — is
    oracle-verifiable, the `pipeline.py` convention.  Returns
    (``id_col``, cell, is_dup, noisy, outlier, keep).

    Scale shape: the union of the component plans (each documented at
    its definition); the final assembly is two id-keyed joins of |V|-row
    flag tables.  The default noise screen is the EXACT full-table kNN
    — quadratic, the validation-scale / oracle-truth path; at corpus
    scale pass ``neighbors`` = the LSH :func:`knn_graph` output and the
    noise stage becomes linear (the :func:`knn_label_noise` contract).
    """
    dup = semantic_dedup(
        spark, embeddings, k=k, iters=iters, threshold=dedup_threshold,
        seed=seed, id_col=id_col, vec_col=vec_col,
    ).select(id_col, "cell", "is_dup")
    noise = knn_label_noise(
        embeddings, k=knn_k, flag_threshold=noise_threshold,
        id_col=id_col, vec_col=vec_col, label_col=label_col,
        neighbors=neighbors,
    ).select(id_col, F.col("flagged").alias("noisy"))
    out = kmeans_outliers(
        spark, embeddings, k=k, iters=iters, seed=seed, z_thresh=z_thresh,
        id_col=id_col, vec_col=vec_col,
    ).select(id_col, F.col("is_outlier").alias("outlier"))
    return (
        dup.join(noise, id_col).join(out, id_col)
        .select(
            id_col, "cell", "is_dup", "noisy", "outlier",
            (~F.col("is_dup") & ~F.col("noisy") & ~F.col("outlier")).alias("keep"),
        )
    )
