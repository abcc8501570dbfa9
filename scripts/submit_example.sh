#!/usr/bin/env bash
# Cluster submission (north_rule: spark-submit --py-files on multi-executor
# clusters at N and 4N executors).  Locally this sandbox runs local[N];
# on a real cluster the same zip + job script run unchanged:
#
#   ./scripts/submit_example.sh yarn 200    # N executors
#   ./scripts/submit_example.sh yarn 800    # 4N executors
set -euo pipefail
MASTER="${1:-local[32]}"
EXECUTORS="${2:-4}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"

ZIP="$(mktemp -d)/address_matcher_spark.zip"
(cd "$REPO" && zip -qr "$ZIP" address_matcher_spark)

spark-submit \
  --master "$MASTER" \
  --num-executors "$EXECUTORS" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=20000 \
  --conf spark.sql.caseSensitive=true \
  "$REPO/scripts/job_match.py"
