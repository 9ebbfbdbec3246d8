#!/usr/bin/env bash
# Deployment path for the corpus-curation job: package the engine and
# run curation.py via spark-submit --py-files (same packaging contract
# as submit_pipeline.sh). Usage:
#
#   tools/submit_curation.sh INPUT_PARQUET OUTPUT_DIR [curation args...]
#
# e.g. tools/submit_curation.sh /data/documents /data/curated \
#          --target-tokens 2048 --weights '{"web": 0.5, "books": 1.0}' \
#          --benchmark /data/eval_suite
#
# On a cluster, replace --master with the cluster master URL; the
# package travels in the zip, workers import it from there.
set -euo pipefail

ROOT="$(cd "$(dirname "$0")/.." && pwd)"
IN="${1:?usage: submit_curation.sh INPUT_PARQUET OUTPUT_DIR [args...]}"
OUT="${2:?usage: submit_curation.sh INPUT_PARQUET OUTPUT_DIR [args...]}"
shift 2

ZIP="$(mktemp -d)/traval_spark.zip"
(cd "$ROOT" && zip -qr "$ZIP" traval_spark -x '*__pycache__*')

exec "${SPARK_HOME:-/opt/spark}"/bin/spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-32}]" \
  --py-files "$ZIP" \
  --conf spark.sql.session.timeZone=UTC \
  "$ROOT/traval_spark/curation.py" \
  --input "$IN" --output "$OUT" "$@"
