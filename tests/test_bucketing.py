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


@pytest.fixture(scope="module")
def er_sides(spark):
    """Small standardised sides for the job-shaped bucketing tests."""
    from address_matcher_spark import datagen
    from address_matcher_spark.plans import pipeline as P

    fx = datagen.generate(datagen.Scale(n_ref=400, n_search=300))
    cfg = P.MatchConfig()
    search = P.prepare_search(
        P.search_from_pages(spark.createDataFrame(fx["pages"])), cfg
    )
    ref = P.prepare_reference(spark.createDataFrame(fx["reference_addresses"]))
    smin = P.standardise_search(search, False)
    sfull = P.standardise_search(search, True)
    # pre-dedup so bucketed/plain runs pick identical dup survivors
    rmin = P.standardise_reference(ref, False).dropDuplicates(
        ["postcode_search", "reference_mod_address"]
    )
    rfull = P.standardise_reference(ref, True).dropDuplicates(
        ["postcode_search", "reference_mod_address"]
    )
    return {
        "smin": smin.localCheckpoint(), "sfull": sfull.localCheckpoint(),
        "rmin": rmin.localCheckpoint(), "rfull": rfull.localCheckpoint(),
        "cfg": cfg,
    }


def _shuffle_count(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")


def test_bucketed_ref_blocking_prep_exchange_free(spark, tmp_path, er_sides):
    """The job's AM_BUCKETED_REF_DIR path: every per-pass ref-side op that
    keys on the block key — dedup, histogram, semi-join prefilter — must
    plan with NO shuffle exchange on the reference branch when the ref
    side is a bucketed table (the 100 TB dimension never crosses the
    wire; only the search branch's distinct shuffles)."""
    from address_matcher_spark.operators import blocking
    from address_matcher_spark.sources import bucketing as BK

    rb = BK.ensure_bucketed_ref(
        spark, er_sides["rmin"], "t_am_ref_min_prep", n_buckets=8,
        path=str(tmp_path / "ref_min_prep"),
    )

    def blocking_prep(r, with_prefilter=True):
        r2 = (
            r.filter(F.col("postcode_search") != "")
            .withColumnRenamed("postcode_search", "__bk")
            .drop("street_key")
            .dropDuplicates(["__bk", "reference_mod_address"])
        )
        if with_prefilter:
            s = (
                er_sides["smin"].filter(F.col("postcode_search") != "")
                .withColumnRenamed("postcode_search", "__bk")
            )
            r2 = blocking.prefilter_ref(r2, s, "__bk")
        return r2.groupBy("__bk").count()

    # dedup + histogram alone: zero shuffles bucketed, >=1 plain
    assert _shuffle_count(blocking_prep(rb, False)) == 0
    assert _shuffle_count(blocking_prep(er_sides["rmin"], False)) >= 1
    # with the semi-join prefilter: only the search branch may shuffle
    n_bucketed = _shuffle_count(blocking_prep(rb))
    n_plain = _shuffle_count(blocking_prep(er_sides["rmin"]))
    assert n_bucketed <= 1, n_bucketed
    assert n_plain >= n_bucketed + 1, (n_plain, n_bucketed)
    plan = blocking_prep(rb)._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan
    spark.sql("DROP TABLE IF EXISTS t_am_ref_min_prep")


def test_bucketed_ref_waterfall_results_equal(spark, tmp_path, er_sides):
    """run_waterfall over bucketed ref tables (ref_materialized=True, the
    job's opt-in path) must produce the same decisions as the plain run."""
    from address_matcher_spark.plans import pipeline as P
    from address_matcher_spark.sources import bucketing as BK

    rb_min = BK.ensure_bucketed_ref(
        spark, er_sides["rmin"], "t_am_ref_min_wf", n_buckets=8,
        path=str(tmp_path / "ref_min_wf"),
    )
    rb_full = BK.ensure_bucketed_ref(
        spark, er_sides["rfull"], "t_am_ref_full_wf", n_buckets=8,
        path=str(tmp_path / "ref_full_wf"),
    )
    cols = ["record_id", "ref_id", "full_match", "fuzzy_score", "match_method"]
    plain = {
        tuple(r) for r in P.run_waterfall(
            er_sides["smin"], er_sides["sfull"],
            er_sides["rmin"], er_sides["rfull"], er_sides["cfg"],
        ).select(*cols).collect()
    }
    bucketed = {
        tuple(r) for r in P.run_waterfall(
            er_sides["smin"], er_sides["sfull"], rb_min, rb_full,
            er_sides["cfg"], ref_materialized=True,
        ).select(*cols).collect()
    }
    assert plain == bucketed and len(plain) > 0
    spark.sql("DROP TABLE IF EXISTS t_am_ref_min_wf")
    spark.sql("DROP TABLE IF EXISTS t_am_ref_full_wf")


def test_bucketed_ref_reregisters_without_rewrite(spark, tmp_path, er_sides):
    """Cross-run reuse: a fresh session's in-memory catalog has no table
    metadata, so ensure_bucketed_ref re-DECLARES the table over the
    existing files (CREATE TABLE ... CLUSTERED BY ... LOCATION) instead
    of rewriting — simulated here by dropping the external table
    (metadata only; files stay)."""
    import os

    path = str(tmp_path / "ref_min_rereg")
    rb = BK.ensure_bucketed_ref(
        spark, er_sides["rmin"], "t_am_ref_rereg", n_buckets=8, path=path,
    )
    n_rows = rb.count()
    files_before = {
        f: os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path) if f.endswith(".parquet")
    }
    spark.sql("DROP TABLE t_am_ref_rereg")  # external: files survive
    assert not spark.catalog.tableExists("t_am_ref_rereg")
    rb2 = BK.ensure_bucketed_ref(
        spark, er_sides["rmin"], "t_am_ref_rereg", n_buckets=8, path=path,
    )
    assert rb2.count() == n_rows
    files_after = {
        f: os.path.getmtime(os.path.join(path, f))
        for f in os.listdir(path) if f.endswith(".parquet")
    }
    assert files_before == files_after  # re-registered, not rewritten
    # and the re-declared table still plans bucketed (no exchange on a
    # self-join over the bucket key)
    plan = (
        rb2.dropDuplicates(["postcode_search", "reference_mod_address"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan
    spark.sql("DROP TABLE IF EXISTS t_am_ref_rereg")


def test_bucketed_ref_redeclare_validates_sidecar(spark, tmp_path, er_sides):
    """ADVICE r4: CREATE TABLE ... CLUSTERED BY over existing files is a
    pure trust declaration — re-declaring with a different bucket count,
    key, or schema must RAISE, not silently misdeclare (Spark would
    assume a hash partitioning the files don't have and exchange-free
    joins would drop/misroute rows)."""
    import json
    import os

    import pytest as _pytest

    path = str(tmp_path / "ref_min_spec")
    BK.ensure_bucketed_ref(
        spark, er_sides["rmin"], "t_am_ref_spec", n_buckets=8, path=path,
    )
    assert os.path.exists(os.path.join(path, "_bucket_spec.json"))
    spark.sql("DROP TABLE t_am_ref_spec")

    # changed bucket count -> refuse
    with _pytest.raises(ValueError, match="n_buckets"):
        BK.ensure_bucketed_ref(
            spark, er_sides["rmin"], "t_am_ref_spec", n_buckets=16, path=path,
        )
    # changed schema -> refuse
    with _pytest.raises(ValueError, match="schema"):
        BK.ensure_bucketed_ref(
            spark, er_sides["rmin"].drop("street_key"), "t_am_ref_spec",
            n_buckets=8, path=path,
        )
    def _drop_sidecar():
        os.remove(os.path.join(path, "_bucket_spec.json"))
        # the local ChecksumFileSystem keeps a .crc shadow; drop it so a
        # later sidecar write/hand-edit reads cleanly
        crc = os.path.join(path, "._bucket_spec.json.crc")
        if os.path.exists(crc):
            os.remove(crc)

    # missing sidecar + CORRECT declaration -> one-time migration: the
    # layout is proven by scanning (schema, per-row bucket hash vs
    # filename id, in-file sort) and the sidecar is rewritten
    _drop_sidecar()
    rb = BK.ensure_bucketed_ref(
        spark, er_sides["rmin"], "t_am_ref_spec", n_buckets=8, path=path,
    )
    assert rb.count() == er_sides["rmin"].count()
    assert os.path.exists(os.path.join(path, "_bucket_spec.json"))
    spark.sql("DROP TABLE t_am_ref_spec")

    # missing sidecar + WRONG bucket count -> the scan catches the hash
    # mismatch (rows land in buckets the declaration says they shouldn't;
    # 16 passes the filename-id check — max id 7 < 16 — so only the
    # per-row hash probe can refuse it)
    _drop_sidecar()
    with _pytest.raises(ValueError, match="hash"):
        BK.ensure_bucketed_ref(
            spark, er_sides["rmin"], "t_am_ref_spec", n_buckets=16,
            path=path,
        )
    assert not os.path.exists(os.path.join(path, "_bucket_spec.json"))
    # restore the good sidecar for the hand-edit case below
    BK.ensure_bucketed_ref(
        spark, er_sides["rmin"], "t_am_ref_spec", n_buckets=8, path=path,
    )
    spark.sql("DROP TABLE t_am_ref_spec")
    _drop_sidecar()
    # sidecar disagreeing with the files' bucket ids -> refuse
    spec = {
        "key": "postcode_search", "n_buckets": 4, "sort": True,
        "schema": [[f.name, f.dataType.simpleString()]
                   for f in er_sides["rmin"].schema.fields],
    }
    with open(os.path.join(path, "_bucket_spec.json"), "w") as fh:
        json.dump(spec, fh)
    with _pytest.raises(ValueError, match="bucket-id"):
        BK.ensure_bucketed_ref(
            spark, er_sides["rmin"], "t_am_ref_spec", n_buckets=4, path=path,
        )
    assert not spark.catalog.tableExists("t_am_ref_spec")
