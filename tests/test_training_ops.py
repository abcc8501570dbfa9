"""Semantic tests for the training-data operators: dedup families find
planted near-duplicates, similarity search ranks correctly, multimodal
plumbing round-trips binary columns through mapInPandas."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from address_matcher_spark.operators import dedup, multimodal, similarity, textstats

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (1, "the quick brown fox jumps over the lazy dog and runs far away home"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog and runs far away now"),   # near dup of 0
    (3, "completely different content about spark shuffle partitions and skew"),
    (4, "der schnelle braune fuchs springt und ist nicht mit der zeit"),
    (5, "le renard brun rapide saute et les chiens sont dans la maison pour"),
    (6, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "text"])
    ).cache()


def test_exact_duplicates(docs):
    groups = dedup.exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_copies"] == 2
    assert groups[0]["keeper_id"] == 0


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r.a, r.b): r.jaccard
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] >= 0.5
    assert not any({a, b} & {3, 4, 5} and {a, b} & {0, 1, 2}
                   for a, b in pairs)


def test_minhash_lsh_candidates(docs):
    cand = {(r.a, r.b) for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert (0, 1) in cand  # identical docs share every band
    assert (0, 3) not in cand and (1, 3) not in cand


def test_simhash_similarity(spark, docs):
    rows = {r.doc_id: r.simhash for r in dedup.simhash_buckets(docs).collect()}
    assert rows[0] == rows[1]  # identical text → identical simhash

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(rows[0], rows[2]) < hamming(rows[0], rows[3])


def test_lang_id(spark, docs):
    got = {r.doc_id: r.lang_pred
           for r in textstats.document_stats(docs).collect()}
    assert got[0] == "en" and got[3] == "en"
    assert got[4] == "de"
    assert got[5] == "fr"
    assert got[6] == "und"


def test_cosine_topk_ranking(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    top = similarity.cosine_topk(df, [1.0, 0.0, 0.0], k=2).collect()
    assert [r.vec_id for r in top] == [0, 1]
    assert top[0]["cosine"] == pytest.approx(1.0)


def test_knn_join(spark):
    vecs = [(i, [float(i), 1.0]) for i in range(6)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = similarity.knn_join_bruteforce(
        df.filter("vec_id = 0"), df, k=2
    ).collect()
    assert len(out) == 2
    assert all(r.qid == 0 and r.cid != 0 for r in out)


def test_multimodal_plumbing(spark):
    payloads = [
        (1, b"\x89PNG\r\n" + b"x" * 100),
        (2, b"\xff\xd8\xff\xe0" + b"y" * 50),
        (3, b"plain bytes"),
    ]
    df = spark.createDataFrame(payloads, "id long, payload binary")
    meta = {r.id: r for r in multimodal.media_metadata(df, "payload", "id").collect()}
    assert meta[1].media_type == "image/png"
    assert meta[2].media_type == "image/jpeg"
    assert meta[3].media_type == "application/octet-stream"
    assert meta[1].n_bytes == 106

    feats = {r.id: r for r in multimodal.extract_features(df, "payload", "id").collect()}
    assert set(feats) == {1, 2, 3}
    assert all(len(f.feature) == 8 for f in feats.values())
    assert all(1 <= f.width <= 1024 for f in feats.values())
    # deterministic: same payload → same feature
    feats2 = {r.id: r for r in multimodal.extract_features(df, "payload", "id").collect()}
    assert feats[1].feature == feats2[1].feature


def test_ngram_jaccard_dropped_shingle_count(spark):
    """The doc-freq cap reports how many shingles it dropped when asked."""
    from address_matcher_spark.operators import dedup as D

    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)]
    rows += [(10, "completely different text body here now"),
             (11, "completely different text body here now")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    dropped = []
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.9, max_doc_freq=4,
                                  dropped_out=dropped)
    got = {(r["a"], r["b"]) for r in pairs.collect()}
    # the 5-copy doc's shingles exceed df=4 and are capped -> that clique
    # is lost (recall trade); the 2-copy pair survives
    assert (10, 11) in got
    assert dropped and dropped[0] > 0
