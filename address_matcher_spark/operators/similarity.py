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


def _plane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random plane component in [-1000, 1000]:
    md5-derived, reproducible in any engine."""
    key = F.concat(F.lit(f"plane:{plane}:"), F.lit(str(dim)))
    h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
    return (h % 2001 - 1000).cast("double")


def hyperplane_signature(vec: Column, n_planes: int, dim: int) -> Column:
    """Sign-of-dot-product LSH signature as a bigint bucket id."""
    terms = []
    for p in range(n_planes):
        plane = F.array(*[_plane_component(p, d) for d in range(dim)])
        dot = _dot(vec, plane)
        terms.append(
            F.when(dot >= 0, F.lit(2 ** p).cast("bigint")).otherwise(F.lit(0))
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to the query's
    hyperplane bucket (plus verification-friendly bucket column)."""
    dim = len(query_vec)
    bucketed = embeddings.withColumn(
        "bucket", hyperplane_signature(F.col(vec_col), n_planes, dim)
    )
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qsig = (
        bucketed.sparkSession.range(1)
        .select(hyperplane_signature(q, n_planes, dim).alias("b"))
        .collect()[0]["b"]
    )
    cand = bucketed.filter(F.col("bucket") == int(qsig))
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
    n_planes: int = 6, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Corpus×corpus approximate k-NN join — the scale path the broadcast
    brute-force join can't take: both sides get a hyperplane-LSH bucket
    and candidates come only from the SAME bucket, so the join is a plain
    equi-join on `bucket` (shuffle ∝ rows, pairs ∝ Σ bucket²) instead of a
    full cross product.  Top-k per left id via one row_number window.

    At 100 TB: bucket is the natural cluster/partition key for both
    tables; with b buckets the pair fan-out drops by ~b× vs brute force.
    Recall is tunable with n_planes (fewer planes → bigger buckets →
    higher recall, more compute) or by OR-ing several plane sets like the
    MinHash band trick (dedup.minhash_lsh_pairs).
    """
    from pyspark.sql import Window

    sig = hyperplane_signature(F.col(vec_col), n_planes, dim)
    l = left.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"),
        sig.alias("bucket"),
    )
    r = right.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"),
        sig.alias("bucket"),
    )
    pairs = l.join(r, "bucket").filter(F.col("qid") != F.col("cid"))
    scored = pairs.select(
        "qid", "cid", "bucket",
        F.round(cosine_similarity(F.col("qvec"), F.col("cvec")), 4).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
