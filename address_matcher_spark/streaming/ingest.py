"""Structured Streaming ingest: incremental pages → incremental matching.

The reference is batch/request-driven (SURVEY §2.11) — its only
incremental behaviour is the API checkpoint/resume loop
(tools/matcher_funcs.py:111-369).  At web scale the natural shape is a
stream of crawled pages; this module provides:

  stream_pages        — file-source readStream over pages parquet drops
  deduped_pages       — watermarked url-dedup (late/replayed crawls)
  incremental_match   — foreachBatch: each micro-batch runs the SAME
                        batch fuzzy pass against the static reference and
                        appends to a parquet sink; exactly-once via the
                        streaming checkpoint + idempotent batch-id dir
  matches_per_window  — windowed aggregation (matches per postcode area
                        per crawl-time window) with late-data watermark

Tests drive it with Trigger.AvailableNow so the whole thing runs
deterministically in CI and equals the batch result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

PAGES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("html", BinaryType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])


def stream_pages(spark: SparkSession, input_dir: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def deduped_pages(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Drop replayed/duplicate urls; the watermark bounds dedup state so
    it doesn't grow with the crawl (late arrivals beyond it re-emit)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url"])
    )


def incremental_match(
    pages_stream: DataFrame,
    ref_min: DataFrame,
    ref_full: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    cfg=None,
):
    """Each micro-batch of pages runs the batch waterfall against the
    static (broadcast-scale or pre-partitioned) reference and appends
    matches.  The streaming checkpoint gives exactly-once batch ids."""
    from address_matcher_spark.plans import pipeline as P

    cfg = cfg or P.MatchConfig(run_field_passes=False)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        search = P.prepare_search(P.search_from_pages(batch_df), cfg)
        res = P.run_waterfall(
            P.standardise_search(search, False),
            P.standardise_search(search, True),
            ref_min, ref_full, cfg,
        )
        (
            res.filter(F.col("full_match"))
            .select("record_id", "url", "full_address", "ref_id", "UPRN",
                    "fuzzy_score", "match_method")
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append").parquet(out_dir)
        )

    return (
        pages_stream.writeStream
        .foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def matches_per_window(pages: DataFrame, window: str = "10 minutes",
                       watermark: str = "30 minutes") -> DataFrame:
    """Windowed crawl-rate aggregation with late-data handling: pages per
    language per event-time window."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), F.col("lang"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "lang", "n_pages",
        )
    )


CHANGE_EVENT_SCHEMA = (
    "url string, event string, n_crawls long, content_hash string"
)
_URL_STATE_SCHEMA = "n_crawls long, last_hash string"


def url_change_events(pages: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: track per-url
    crawl state (crawl count + last content hash) across micro-batches and
    emit an event row whenever a url is first seen ('new') or its content
    changes ('changed'); re-crawls with identical content emit nothing.

    State is keyed by url and bounded by the key domain (at web scale,
    pair with a ProcessingTimeTimeout eviction or an upstream watermarked
    dedup).  This is the shape the reference's API-checkpoint loop
    (tools/matcher_funcs.py:111-369) wants at stream scale: remember what
    you already fetched, act only on novelty."""
    import hashlib

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def track(key, batches, state: GroupState):
        url = key[0]
        n_crawls, last_hash = (state.get if state.exists else (0, None))
        events = []
        rows = pd.concat(list(batches), ignore_index=True)
        # deterministic within-batch order: process by event time
        rows = rows.sort_values("warc_ts")
        for text in rows["text"]:
            h = hashlib.md5(("" if text is None else text).encode()).hexdigest()
            n_crawls += 1
            if last_hash is None:
                events.append((url, "new", n_crawls, h))
            elif h != last_hash:
                events.append((url, "changed", n_crawls, h))
            last_hash = h
        state.update((n_crawls, last_hash))
        if events:
            yield pd.DataFrame(
                events, columns=["url", "event", "n_crawls", "content_hash"]
            )

    return (
        pages.groupBy("url")
        .applyInPandasWithState(
            track,
            outputStructType=CHANGE_EVENT_SCHEMA,
            stateStructType=_URL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
