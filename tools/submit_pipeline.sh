#!/usr/bin/env bash
# North-rule deployment path: package the engine and run the rollup job
# via spark-submit --py-files (BASELINE.json north_rule). Usage:
#
#   tools/submit_pipeline.sh /tmp/tiers_out [extra pipeline args...]
#
# e.g. tools/submit_pipeline.sh /tmp/tiers_out \
#          --synth-rows 1000000 --retention default --resume
#
# On a cluster, replace --master with the cluster master URL; everything
# else is unchanged — the package travels in the zip, workers import it
# from there (no PYTHONPATH assumptions).
set -euo pipefail

ROOT="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:?usage: submit_pipeline.sh OUTPUT_DIR [pipeline args...]}"
shift

ZIP="$(mktemp -d)/traval_spark.zip"
(cd "$ROOT" && zip -qr "$ZIP" traval_spark -x '*__pycache__*')

exec "${SPARK_HOME:-/opt/spark}"/bin/spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --py-files "$ZIP" \
  --conf spark.sql.session.timeZone=UTC \
  "$ROOT/traval_spark/pipeline.py" \
  --output "$OUT" "$@"
