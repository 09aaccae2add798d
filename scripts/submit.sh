#!/usr/bin/env bash
# Package the engine and run the crawl via spark-submit --py-files —
# the north-rule deployment shape.  Usage:
#   scripts/submit.sh [--master local[8]] -- <run_crawl.py args...>
# Example:
#   scripts/submit.sh --master local[8] -- \
#     --corpus .cache/bench_corpus_small --root /tmp/submit_run
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="local[8]"
if [[ "${1:-}" == "--master" ]]; then MASTER="$2"; shift 2; fi
[[ "${1:-}" == "--" ]] && shift

ZIP="$(mktemp -d)/cbwcis.zip"
(cd "$REPO" && zip -qr "$ZIP" cloud_based_web_crawling_indexing_system_spark \
  -x '*__pycache__*')

exec "${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
  --master "$MASTER" \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-32}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --py-files "$ZIP" \
  "$REPO/scripts/run_crawl.py" "$@"
