"""Bucketed co-located joins: the plan must contain NO exchange when both
sides are bucketed on the join key with equal bucket counts — the 100 TB
blocking-join shape (SURVEY §6 scale notes; sources/bucketing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from address_matcher_spark.sources import bucketing as BK


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cobucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    left = spark.range(0, 5000).select(
        (F.col("id") % 97).cast("string").alias("bk"),
        F.col("id").alias("record_id"),
    )
    right = spark.range(0, 8000).select(
        (F.col("id") % 97).cast("string").alias("bk"),
        F.col("id").alias("ref_id"),
    )
    BK.write_bucketed(left, "t_search_b", "bk", 8,
                      path=str(tmp_path / "search_b"))
    BK.write_bucketed(right, "t_ref_b", "bk", 8,
                      path=str(tmp_path / "ref_b"))
    joined = BK.cobucketed_join(spark, "t_search_b", "t_ref_b", "bk")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # co-located: zero shuffle
    # correctness: equal-key pair count matches the computed expectation
    n = joined.count()
    want = (
        left.groupBy("bk").count().withColumnRenamed("count", "lc")
        .join(right.groupBy("bk").count().withColumnRenamed("count", "rc"), "bk")
        .agg(F.sum(F.col("lc") * F.col("rc")).alias("p")).collect()[0]["p"]
    )
    assert n == want
    spark.sql("DROP TABLE IF EXISTS t_search_b")
    spark.sql("DROP TABLE IF EXISTS t_ref_b")


def test_bucket_pruning_on_key_filter(spark, tmp_path):
    df = spark.range(0, 4000).select(
        (F.col("id") % 50).cast("string").alias("bk"),
        F.col("id").alias("v"),
    )
    BK.write_bucketed(df, "t_pruned_b", "bk", 8,
                      path=str(tmp_path / "pruned_b"))
    # the auto-bucketed-scan rule turns bucketed reading off for
    # filter-only queries (it only counts joins/aggregates as benefit);
    # force it on to observe the pruning the planner is capable of
    old = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
                   "false")
    try:
        q = spark.table("t_pruned_b").filter(F.col("bk") == "7")
        plan = q._jdf.queryExecution().executedPlan().toString()
        # bucket pruning is reported on the scan: only 1 of 8 buckets read
        assert "SelectedBucketsCount: 1 out of 8" in plan
        assert q.count() == 80
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", old
        )
        spark.sql("DROP TABLE IF EXISTS t_pruned_b")
