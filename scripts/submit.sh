#!/usr/bin/env bash
# Package + submit the pipeline job (north rule: spark-submit --py-files
# on a multi-executor cluster).  MASTER defaults to local[*] so the same
# script smoke-tests on one box; on a cluster pass MASTER=yarn / k8s://...
set -euo pipefail
cd "$(dirname "$0")/.."
MASTER="${MASTER:-local[*]}"
zip -qr /tmp/pbf2json_spark.zip pbf2json_spark -i '*.py'
exec spark-submit --master "$MASTER" \
    --py-files /tmp/pbf2json_spark.zip \
    scripts/pipeline_job.py "$@"
