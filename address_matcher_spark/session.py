"""SparkSession factory tuned for the matching pipeline.

Settings rationale (100 TB target, tested on local[N]):
  * AQE on with skew-join splitting — blocking keys are Zipf-skewed
    (the reference hand-rolled a greedy batcher for exactly this,
    tools/matcher_funcs.py:894-986; AQE + explicit salting replace it).
  * Arrow batches capped so a pair-scoring batch's string matrix fits in
    executor memory (the reference capped batches at 10k x 20k rows,
    tools/constants.py:217-218).
  * shuffle partitions default to cores on local mode; on a real cluster
    leave spark.sql.shuffle.partitions to AQE coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_MAX_RECORDS = 20_000


def get_spark(
    app_name: str = "address-matcher-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalescing stays ON for the many tiny bookkeeping stages
        # (it cuts per-stage task-dispatch overhead at high core counts).
        # It sizes partitions by BYTES, which is the wrong model for the
        # compute-bound scoring stage — that stage is therefore pinned
        # with an explicit numbered repartition (exempt from coalescing)
        # in fuzzy_pass/field_pass rather than disabling coalescing
        # globally.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # Opt-in straggler re-launch (scaling lever under test): on a real
    # cluster speculation re-runs a descheduled task on a healthy
    # executor; in local mode the copy competes for the same contended
    # cores, so whether it pays is measured (scripts/scaling_run.py A/B),
    # not assumed.  Aggressive-ish thresholds because the straggler tail
    # under test is ~20% proportional, not pathological outliers.
    if os.environ.get("SPARK_GRAFT_SPECULATION") == "1":
        builder = (
            builder.config("spark.speculation", "true")
            .config("spark.speculation.interval", "1s")
            .config("spark.speculation.multiplier", "1.5")
            .config("spark.speculation.quantile", "0.75")
        )
    return builder.getOrCreate()
