"""Star-edge LSH connectivity ≡ pairwise LSH connectivity (round 8).

The CC-only consumers of the LSH band join (minhash clusters, the
incremental refresh, the corpus keep-list) never need the quadratic
within-bucket pair set — per-(band, band_sig) star edges (every member →
the bucket min) give identical connected components in O(bucket) edges
instead of O(bucket²).  These tests pin that equivalence on the sf
documents table plus a crafted near-dup clique (the shape that made the
pairwise form quadratic at bench scale).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from address_matcher_spark.operators import dedup
from address_matcher_spark.operators.cluster import connected_components


def _pdf(labels) -> pd.DataFrame:
    return (
        labels.toPandas()
        .astype({"node": "int64", "cluster_id": "int64"})
        .sort_values(["node", "cluster_id"])
        .reset_index(drop=True)
    )


def _pairwise_labels(docs):
    pairs = dedup.minhash_lsh_pairs(docs)
    return connected_components(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )


def _clique_docs(spark, sf_dir: str):
    """sf documents plus a 40-doc near-dup clique (one shared long
    prefix, tiny per-doc suffix) — every clique member collides in at
    least one band, so the pairwise band join would emit O(40²) pairs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    base = ("the quick brown fox jumps over the lazy dog again and again "
            "with remarkable persistence throughout the corpus ") * 3
    clique = spark.createDataFrame(
        [(900_000 + i, base) for i in range(40)]
        + [(950_000 + i, base + f"variant {i}") for i in range(10)],
        "doc_id long, text string",
    )
    return docs.unionByName(clique)


def test_star_labels_equal_pairwise_labels(spark, sf_dir):
    docs = _clique_docs(spark, sf_dir)
    star = connected_components(dedup.minhash_lsh_star_edges(docs))
    expected = _pdf(_pairwise_labels(docs))
    got = _pdf(star)
    pd.testing.assert_frame_equal(got, expected)
    # the crafted clique must actually exercise the bucket-star path
    assert (got["node"] >= 900_000).any()


def test_star_edges_linear_in_bucket(spark, sf_dir):
    """Edge count from a b-member bucket is b-1 per band (≤ docs×bands
    total), not b(b-1)/2 — the point of the rewrite."""
    docs = _clique_docs(spark, sf_dir)
    n_docs = docs.count()
    n_edges = dedup.minhash_lsh_star_edges(docs).count()
    assert n_edges <= n_docs * 4  # 4 bands
    n_pairs = dedup.minhash_lsh_pairs(docs).count()
    assert n_pairs > n_edges  # the clique makes the pairwise form bigger
