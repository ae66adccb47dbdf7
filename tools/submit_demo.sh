#!/usr/bin/env bash
# Real `spark-submit --py-files` drive (the north rule's launch path):
# package the library as a zip, submit the CLI script with NO repo on
# PYTHONPATH, build an index from the sf0.001 documents, then search it.
# Works against local[*] (default) or a standalone master:
#   tools/submit_demo.sh [spark://127.0.0.1:7077]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${1:-local[8]}"
WORK=$(mktemp -d /tmp/submit-demo.XXXX)
trap 'rm -rf "$WORK"' EXIT

(cd "$REPO" && zip -qr "$WORK/seismic_spark.zip" seismic_spark)

SUBMIT="${SPARK_HOME:-/opt/spark}/bin/spark-submit"
COMMON=(--master "$MASTER" --py-files "$WORK/seismic_spark.zip"
        --conf spark.sql.shuffle.partitions=16
        --conf spark.sql.session.timeZone=UTC
        --conf spark.ui.enabled=false)

# cd away from the repo so only --py-files provides the package
cd "$WORK"
"$SUBMIT" "${COMMON[@]}" "$REPO/seismic_spark/cli.py" \
    build --input /root/testdata/sf0.001/documents.parquet \
    --output "$WORK/idx" --n-postings 1000000
"$SUBMIT" "${COMMON[@]}" "$REPO/seismic_spark/cli.py" \
    search --index "$WORK/idx" --query "spark join window" -k 5
echo "SUBMIT_DEMO_OK"
