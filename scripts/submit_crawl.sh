#!/usr/bin/env bash
# Run a crawl job via spark-submit --py-files (the north rule's
# cluster execution path). Packages the engine as a zip, ships it to
# executors, and drives the same CLI the local path uses.
#
#   scripts/submit_crawl.sh -c cfg.yaml -p pages.parquet -s /store \
#       [--master spark://host:7077] [extra scrape args...]
#
# Defaults to local[*] when no --master is given (no real cluster in
# the sandbox); on a cluster, pass the master URL and the identical
# artifact runs on every executor.
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
BUILD_DIR="${WSS_BUILD_DIR:-/tmp/wss-build}"
MASTER="local[*]"

args=()
while [[ $# -gt 0 ]]; do
  case "$1" in
    --master) MASTER="$2"; shift 2 ;;
    *) args+=("$1"); shift ;;
  esac
done

mkdir -p "$BUILD_DIR"
ZIP="$BUILD_DIR/web_scrapper_spark.zip"
(cd "$REPO_ROOT" && rm -f "$ZIP" \
  && zip -qr "$ZIP" web_scrapper_spark -x '*__pycache__*')

exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$REPO_ROOT/scripts/submit_driver.py" scrape "${args[@]}"
