"""Incremental corpus-refresh dedup ≡ one-shot clustering.

dedup.incremental_dedup_labels labels a NEW batch against the persisted
corpus state (signature table + prior cluster labels) without re-pairing
the old corpus against itself.  These tests prove the defining property:
batch-by-batch application equals the one-shot minhash_lsh_pairs →
connected_components clustering of the full corpus — for a two-way split,
for a chained three-batch refresh, and with crafted cross-batch exact
twins (which take the content-hash anti-join path, never the band join).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from address_matcher_spark.operators import dedup
from address_matcher_spark.operators.cluster import connected_components


def _one_shot_labels(docs):
    pairs = dedup.minhash_lsh_pairs(docs)
    return connected_components(
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )


def _pdf(labels) -> pd.DataFrame:
    return (
        labels.toPandas()
        .astype({"node": "int64", "cluster_id": "int64"})
        .sort_values(["node", "cluster_id"])
        .reset_index(drop=True)
    )


def _docs_with_cross_batch_twins(spark, sf_dir: str):
    """sf documents plus clones whose ids shift batch parity (+100001), so
    exact twins are guaranteed to straddle the old/new split."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    clones = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100001).alias("doc_id"), "text"
    )
    return docs.unionByName(clones)


def test_two_batch_equals_one_shot(spark, sf_dir):
    docs = _docs_with_cross_batch_twins(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)

    old_sigs = dedup.minhash_signature_table(old)
    old_labels = _one_shot_labels(old)
    inc = dedup.incremental_dedup_labels(new, old_sigs, old_labels)

    expected = _pdf(_one_shot_labels(docs))
    got = _pdf(inc)
    pd.testing.assert_frame_equal(got, expected)
    # the split must actually exercise the machinery: some clusters have
    # to straddle the batches (the +100001 twins guarantee it).  Note the
    # cluster LABEL is the min node id, which often lands in the new
    # batch, so straddling is detected by node membership, not label
    # parity.
    got["is_new"] = got["node"] % 4 == 0
    per_cluster = got.groupby("cluster_id")["is_new"].agg(["any", "all"])
    straddling = per_cluster["any"] & ~per_cluster["all"]
    assert got["is_new"].any(), "no new-batch doc landed in any cluster"
    assert straddling.any(), (
        "no cluster contains both old- and new-batch docs — split too weak"
    )


def test_three_batch_chain_equals_one_shot(spark, sf_dir):
    """State append: sigs accumulate per batch, labels thread through —
    (b0 → b1 → b2) must equal the one-shot over b0∪b1∪b2."""
    docs = _docs_with_cross_batch_twins(spark, sf_dir)
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]

    sigs = dedup.minhash_signature_table(batches[0])
    labels = _one_shot_labels(batches[0])
    for nxt in batches[1:]:
        labels = dedup.incremental_dedup_labels(nxt, sigs, labels)
        sigs = sigs.unionByName(dedup.minhash_signature_table(nxt))

    expected = _pdf(_one_shot_labels(docs))
    pd.testing.assert_frame_equal(_pdf(labels), expected)


def test_exact_twins_labeled_by_content_edge(spark):
    """A new doc byte-identical to an old doc is labeled with the old
    doc's id through the content-hash twin edge (the operator never bands
    exact twins — identical text ⇒ identical signature ⇒ banding them is
    pure waste — so this label can only come from that edge path when the
    twin is excluded from `fresh`)."""
    old = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "zeta eta theta iota kappa")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon"),  # twin of 1
         (11, "completely different text body here")],
        ["doc_id", "text"],
    )
    old_sigs = dedup.minhash_signature_table(old)
    old_labels = _one_shot_labels(old)  # empty: 1 and 2 share no band
    got = _pdf(dedup.incremental_dedup_labels(new, old_sigs, old_labels))
    expected = pd.DataFrame({"node": [1, 10], "cluster_id": [1, 1]}).astype(
        {"node": "int64", "cluster_id": "int64"}
    )
    pd.testing.assert_frame_equal(got, expected)
