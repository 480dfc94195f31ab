#!/usr/bin/env bash
# Run the engine on a cluster via spark-submit --py-files (north rule).
#
#   tools/submit.sh bench.py                     # headline bench
#   tools/submit.sh tools/scaling_bench.py --n 8 # scaling evidence
#   MASTER=spark://host:7077 tools/submit.sh your_job.py
#
# Packages lucene_solr_spark/ into a zip shipped to every executor;
# the driver script is whatever you pass first.
set -euo pipefail
cd "$(dirname "$0")/.."
MASTER="${MASTER:-local[32]}"
ZIP=/tmp/lucene_solr_spark_pkg.zip
rm -f "$ZIP"
zip -qr "$ZIP" lucene_solr_spark __spark_entry__.py -x '*__pycache__*'
SCRIPT="$1"; shift || true
exec spark-submit \
  --master "$MASTER" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-64}" \
  "$SCRIPT" "$@"
