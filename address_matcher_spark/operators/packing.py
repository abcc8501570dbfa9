"""Training-sequence packing: assign documents to fixed-size token chunks.

The GPT-style training-data shape: documents are concatenated in a
deterministic order and the stream is cut every `chunk_tokens` tokens;
a document is described by the chunk where it starts and the chunk where
it ends (documents straddle chunk boundaries — that IS the concat-then-
chunk convention, as opposed to bin packing with padding).

A single global concatenation would put the running token sum on one
task, so documents are first sharded into `n_streams` deterministic
streams by an md5-derived uniform of the document id (the same
dialect-portable u01 as textstats.domain_mix_sample) and each stream
packs independently: the cumulative sum is a window partitioned by
stream, ordered by the document id.  At cluster scale n_streams is a few
× the executor count, so every window partition is ~corpus/n_streams and
the plan is one shuffle (the window's hash partitioning); chunk identity
is (stream, chunk_in_stream).

No reference counterpart (the reference is an address matcher); this is
part of the training-data extension surface alongside operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from address_matcher_spark.operators.textstats import _md5_u01

TOKEN_RE = r"[a-z0-9]+"


def _n_tokens(text: Column) -> Column:
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0))


def pack_chunks(
    docs: DataFrame,
    chunk_tokens: int = 1024,
    n_streams: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per document: its stream, token count, exclusive cumulative offset
    within the stream, and the [start_chunk, end_chunk] span it covers.

    start_chunk = floor(offset / chunk_tokens); a zero-token document
    occupies no chunk span (end_chunk = start_chunk).  Deterministic for
    a GIVEN n_streams: stream = floor(md5-u01(id) · n_streams), order
    within stream = id — so the output is a pure function of (input,
    n_streams), independent of partitioning.  n_streams defaults to
    max(8, defaultParallelism) so the window's hash partitioning scales
    with the cluster (a fixed 8 would put a 1000-core cluster's whole
    corpus on 8 window partitions); jobs that need a run-portable layout
    pin it explicitly, which is what the driver oracle does.
    """
    if n_streams is None:
        n_streams = max(
            8, docs.sparkSession.sparkContext.defaultParallelism
        )
    stream = F.floor(
        _md5_u01(F.col(id_col).cast("string")) * n_streams
    ).cast("int")
    base = docs.select(
        F.col(id_col),
        stream.alias("stream"),
        _n_tokens(F.col(text_col)).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("stream")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        id_col,
        "stream",
        "n_tokens",
        off.cast("bigint").alias("token_offset"),
        F.floor(off / chunk_tokens).cast("bigint").alias("start_chunk"),
        F.floor(
            (off + F.greatest(F.col("n_tokens") - 1, F.lit(0)))
            / chunk_tokens
        ).cast("bigint").alias("end_chunk"),
    )
