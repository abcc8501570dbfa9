"""Per-superstep checkpoint store with lineage + counters (X9, north_rule).

Iceberg is the production target (snapshot-per-superstep, time travel);
this sandbox has no Iceberg jars, so the store writes parquet directories
with a ``_meta.json`` sidecar carrying the same metadata an Iceberg
snapshot summary would: run_id, stage, superstep, row count, per-partition
row counts (lineage), and free-form counters.  Resume = read the latest
committed superstep and continue — the reference's checkpoint/resume
contract (tools/matcher_funcs.py:144-179) generalised to every stage.

Write protocol is commit-last: data lands in the final directory only
after a successful write, then the meta sidecar is atomically renamed in;
a superstep without meta is considered uncommitted and is ignored/retried.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CheckpointStore:
    root: str
    run_id: str

    def _dir(self, stage: str, superstep: int | None = None) -> str:
        p = os.path.join(self.root, self.run_id, stage)
        if superstep is not None:
            p = os.path.join(p, f"superstep={superstep:05d}")
        return p

    def _meta_path(self, stage: str, superstep: int | None) -> str:
        return os.path.join(self._dir(stage, superstep), "_meta.json")

    def write(
        self,
        df: DataFrame,
        stage: str,
        superstep: int | None = None,
        counters: dict | None = None,
    ) -> DataFrame:
        """Materialise a stage output; returns a re-read DataFrame (lineage
        cut — downstream plans read the checkpoint, not the upstream DAG)."""
        path = self._dir(stage, superstep)
        tmp = path + ".__tmp__"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        df.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, path)
        spark = df.sparkSession
        reread = spark.read.parquet(path)
        lineage = (
            reread.groupBy(F.spark_partition_id().alias("partition"))
            .count()
            .collect()
        )
        meta = {
            "run_id": self.run_id,
            "stage": stage,
            "superstep": superstep,
            "rows": int(sum(r["count"] for r in lineage)),
            "partition_rows": {int(r["partition"]): int(r["count"]) for r in lineage},
            "counters": counters or {},
        }
        meta_tmp = self._meta_path(stage, superstep) + ".tmp"
        with open(meta_tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.rename(meta_tmp, self._meta_path(stage, superstep))
        return reread

    def committed(self, stage: str, superstep: int | None = None) -> bool:
        return os.path.exists(self._meta_path(stage, superstep))

    def read(self, spark: SparkSession, stage: str,
             superstep: int | None = None) -> DataFrame:
        return spark.read.parquet(self._dir(stage, superstep))

    def meta(self, stage: str, superstep: int | None = None) -> dict:
        with open(self._meta_path(stage, superstep)) as f:
            return json.load(f)

    def latest_superstep(self, stage: str) -> int | None:
        base = os.path.join(self.root, self.run_id, stage)
        if not os.path.isdir(base):
            return None
        steps = []
        for d in os.listdir(base):
            if d.startswith("superstep=") and os.path.exists(
                os.path.join(base, d, "_meta.json")
            ):
                steps.append(int(d.split("=")[1]))
        return max(steps) if steps else None
