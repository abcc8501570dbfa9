"""Similarity search over embedding columns (array<float>).

  brute-force cosine top-k — the correctness baseline: one scan, dot
  product + norms as native array expressions (zip_with/aggregate), top-k
  via a single ORDER BY ... LIMIT (Spark's TakeOrderedAndProject — no full
  sort materialisation).

  LSH-bucketed variant — the scale path: random-hyperplane signatures from
  deterministic md5-derived planes; candidates only within matching
  signature buckets, so the per-query cost is bucket-sized, not corpus-
  sized.  At 100 TB the bucketing column is the table's cluster/partition
  key and queries prune to matching buckets at scan time.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves string type
# hints (from __future__ import annotations) in the function's GLOBALS,
# so `pd` must live here, not in a closure
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k by cosine against a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 4).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random plane component in [-1000, 1000]:
    md5-derived, reproducible in any engine.  Computed DRIVER-SIDE in
    Python (hashlib md5 ≡ Spark md5 ≡ the oracle's md5, byte for byte):
    the previous Column form built ~8 expression nodes per component —
    768 per signature call over Py4J, which put DataFrame CONSTRUCTION
    at ~27 s per near-dup query before a single row moved.  A literal
    is the same value with zero plan surface."""
    import hashlib

    h = int(hashlib.md5(f"plane:{plane}:{dim}".encode()).hexdigest()[:8], 16)
    return float(h % 2001 - 1000)


def hyperplane_signature(
    vec: Column, n_planes: int, dim: int, band: int = 0
) -> Column:
    """Sign-of-dot-product LSH signature as a bigint bucket id.  Each
    `band` draws a DISJOINT plane set (indices band*n_planes ..), so
    OR-ing several bands is the MinHash band trick for the angular
    family: P[collide in ≥1 band] = 1 - (1 - (1-θ/π)^n_planes)^n_bands —
    recall is tunable without shrinking the per-band bucket count."""
    terms = []
    for p in range(n_planes):
        plane = F.lit(
            [_plane_component(band * n_planes + p, d) for d in range(dim)]
        )
        dot = _dot(vec, plane)
        terms.append(
            F.when(dot >= 0, F.lit(2 ** p).cast("bigint")).otherwise(F.lit(0))
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def banded_signatures(
    df: DataFrame,
    id_alias: str,
    vec_alias: str,
    n_planes: int,
    dim: int,
    n_bands: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One row per (row, band) with that band's bucket id — the exploded
    form that keeps a multiprobe candidate join a plain equi-join on
    (band, bucket).  Row cost is n_bands×, pair cost is per-band Σ bucket²
    summed over bands; the join NEVER degenerates to OR-of-equalities
    (which Catalyst would plan as a nested-loop)."""
    sigs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            hyperplane_signature(F.col(vec_col), n_planes, dim, band=b)
            .alias("bucket"),
        )
        for b in range(n_bands)
    ])
    return df.select(
        F.col(id_col).alias(id_alias),
        F.col(vec_col).alias(vec_alias),
        F.explode(sigs).alias("__bb"),
    ).select(
        id_alias, vec_alias,
        F.col("__bb.band").alias("band"),
        F.col("__bb.bucket").alias("bucket"),
    )


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    n_bands: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the rows
    sharing the query's hyperplane bucket in AT LEAST ONE band (multiprobe
    OR-banding; n_bands=1 is the single-bucket round-2 behavior).  For a
    single query the per-band membership is a pushdown-friendly filter —
    no join needed, so the OR of band equalities stays a plain scan
    predicate."""
    dim = len(query_vec)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qsigs = (
        embeddings.sparkSession.range(1)
        .select(*[
            hyperplane_signature(q, n_planes, dim, band=b).alias(f"b{b}")
            for b in range(n_bands)
        ])
        .collect()[0]
    )
    bucketed = embeddings.withColumn(
        "bucket", hyperplane_signature(F.col(vec_col), n_planes, dim)
    )
    cond = F.col("bucket") == int(qsigs["b0"])
    for b in range(1, n_bands):
        cond = cond | (
            hyperplane_signature(F.col(vec_col), n_planes, dim, band=b)
            == int(qsigs[f"b{b}"])
        )
    cand = bucketed.filter(cond)
    scored = cand.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 4).alias("cosine"),
        "bucket",
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def knn_join_bruteforce(
    left: DataFrame, right: DataFrame, k: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """k-NN join (small×large): broadcast the small left side, window
    top-k per left id — the building block for embedding-dedup."""
    from pyspark.sql import Window

    l = left.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    r = right.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    pairs = F.broadcast(l).crossJoin(r).filter(F.col("qid") != F.col("cid"))
    scored = pairs.select(
        "qid", "cid",
        F.round(cosine_similarity(F.col("qvec"), F.col("cvec")), 4).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_join_lsh(
    left: DataFrame, right: DataFrame, k: int = 3,
    n_planes: int = 6, dim: int = 64, n_bands: int = 1,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Corpus×corpus approximate k-NN join — the scale path the broadcast
    brute-force join can't take: both sides get a hyperplane-LSH bucket
    per band and candidates come only from rows sharing a bucket in some
    band, so the join is a plain equi-join on (band, bucket) — shuffle ∝
    rows×n_bands, pairs ∝ Σ_band Σ bucket² — never a cross product.
    Pairs colliding in several bands are deduplicated BEFORE the cosine
    (each pair scored once).  Top-k per left id via one row_number window.

    At 100 TB: bucket is the natural cluster/partition key for both
    tables; with b buckets the pair fan-out drops by ~b× vs brute force.
    Recall: P[candidate] = 1 - (1 - (1-θ/π)^n_planes)^n_bands — raise
    n_bands for recall at linear candidate cost, instead of shrinking
    n_planes (which coarsens every bucket quadratically).
    """
    from pyspark.sql import Window

    l = banded_signatures(left, "qid", "qvec", n_planes, dim, n_bands,
                          id_col, vec_col)
    r = banded_signatures(right, "cid", "cvec", n_planes, dim, n_bands,
                          id_col, vec_col)
    pairs = l.join(r, ["band", "bucket"]).filter(F.col("qid") != F.col("cid"))
    # deterministic dedup: a pair colliding in several bands keeps its
    # LOWEST band's row (dropDuplicates would pick arbitrarily, making the
    # carried bucket column nondeterministic)
    wd = Window.partitionBy("qid", "cid").orderBy(F.asc("band"))
    pairs = (
        pairs.withColumn("__rn", F.row_number().over(wd))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "band")
    )
    scored = pairs.select(
        "qid", "cid", "bucket",
        F.round(cosine_similarity(F.col("qvec"), F.col("cvec")), 4).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the data-dependent complement to hyperplane LSH
# ---------------------------------------------------------------------------


def _ivf_centroids(corpus: DataFrame, n_cells: int,
                   id_col: str, vec_col: str):
    """Deterministic IVF-flat centroids: the `n_cells` corpus vectors
    with the smallest md5-u01(id) (dialect-portable uniform — the same
    keyed hash the domain-mix sampler uses), L2-normalised into a numpy
    (n_cells, dim) matrix.  Sampling centroids from the data distribution
    is the k-means|| init step; refining them with Lloyd iterations would
    balance cells better but adds nothing to the plan shape, so this
    keeps the index one-pass and fully reproducible in any engine.
    Driver cost: ONE TakeOrdered of n_cells rows."""
    import numpy as np

    from address_matcher_spark.operators.textstats import _md5_u01

    rows = (
        corpus.select(
            F.col(vec_col).alias("v"),
            _md5_u01(F.col(id_col).cast("string")).alias("__u"),
            F.col(id_col).alias("__id"),
        )
        .orderBy("__u", "__id")
        .limit(n_cells)
        .collect()
    )
    m = np.array([list(r["v"]) for r in rows], dtype=np.float64)
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)


def _cell_scores(vecs, mn):
    """Rounded cosine of each vector against every centroid — 6-dp
    rounding BEFORE any argmax/rank makes the engine-vs-oracle float
    summation-order difference (numpy pairwise vs SQL sequential)
    immaterial to cell choice."""
    import numpy as np

    x = np.array(vecs, dtype=np.float64)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-300)
    return np.round(xn @ mn.T, 6)


def _assign_udf(mn):
    """Arrow-batched nearest-centroid assignment (ties → smallest cell
    index, which np.argmax's first-max rule gives for free).  A pandas
    UDF, not an expression tree: n_cells dot products per row as Column
    exprs would repeat the hyperplane Py4J construction blowup this
    module already fixed once (see _plane_component)."""

    @F.pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        import numpy as np

        s = _cell_scores(vs.tolist(), mn)
        return pd.Series(np.argmax(s, axis=1).astype("int32"))

    return assign


def _probe_udf(mn, nprobe: int):
    """Arrow-batched top-`nprobe` cells per query vector (score desc,
    cell index asc via stable argsort)."""

    @F.pandas_udf("array<int>")
    def probe(vs: pd.Series) -> pd.Series:
        import numpy as np

        s = _cell_scores(vs.tolist(), mn)
        order = np.argsort(-s, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return probe


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: corpus rows are assigned to their
    nearest sampled centroid's cell; only the query's `nprobe` nearest
    cells are scanned for exact cosine ranking.

    100 TB shape: `cell` is the table's natural cluster/partition key —
    written once at index-build time, queries prune to nprobe partitions
    at scan time, so per-query work is ~nprobe/n_cells of the corpus.
    Versus hyperplane LSH: cells follow the DATA distribution (sampled
    from it) rather than fixed random planes, so occupancy is even when
    the corpus is clustered — the case where fixed planes leave most
    buckets empty and a few overfull.  Recall is tuned by nprobe at
    linear cost.  The probe choice is driver-side numpy here (one
    literal query); the joined form is ivf_knn_join."""
    import numpy as np

    mn = _ivf_centroids(embeddings, n_cells, id_col, vec_col)
    qs = _cell_scores([query_vec], mn)[0]
    probed = [int(c) for c in np.argsort(-qs, kind="stable")[:nprobe]]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    cand = embeddings.withColumn(
        "cell", _assign_udf(mn)(F.col(vec_col))
    ).filter(F.col("cell").isin(probed))
    scored = cand.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 4).alias("cosine"),
        "cell",
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def ivf_knn_join(
    left: DataFrame,
    right: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus×corpus approximate k-NN join through the IVF index:
    centroids are sampled from the RIGHT (corpus) side, every corpus row
    lands in exactly ONE cell, every left row probes its `nprobe`
    nearest cells, and candidates come from a plain equi-join on `cell`
    — shuffle ∝ corpus + queries×nprobe rows, pairs ∝ Σ probed-cell
    sizes, never a cross product.  Unlike the OR-banded LSH join a pair
    can only meet once (one cell per corpus row), so no dedup pass is
    needed before scoring."""
    from pyspark.sql import Window

    mn = _ivf_centroids(right, n_cells, id_col, vec_col)
    r = right.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    ).withColumn("cell", _assign_udf(mn)(F.col("cvec")))
    l = left.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    ).withColumn("cell", F.explode(_probe_udf(mn, nprobe)(F.col("qvec"))))
    pairs = l.join(r, "cell").filter(F.col("qid") != F.col("cid"))
    scored = pairs.select(
        "qid", "cid", "cell",
        F.round(cosine_similarity(F.col("qvec"), F.col("cvec")), 4)
        .alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
