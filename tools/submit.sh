#!/usr/bin/env bash
# Package the engine and launch the CDC ingest job via spark-submit
# --py-files (north rule's cluster launch shape). Usage:
#
#   tools/submit.sh [spark-submit args...] -- [jobs/run_cdc.py args...]
#
# e.g. locally:
#   tools/submit.sh --master 'local[8]' -- \
#       --table /tmp/lake --events-dir /tmp/wal --checkpoint /tmp/ckpt
# on a cluster:
#   tools/submit.sh --master yarn --deploy-mode cluster \
#       --num-executors 250 --executor-cores 4 -- \
#       --table hdfs:///lake/repos --events-dir hdfs:///wal \
#       --checkpoint hdfs:///ckpt --mode mor --auto-compact 8
set -euo pipefail
ROOT="$(cd "$(dirname "$0")/.." && pwd)"

submit_args=()
while [[ $# -gt 0 && "$1" != "--" ]]; do submit_args+=("$1"); shift; done
[[ $# -gt 0 ]] && shift  # drop the --

zip_path="$(mktemp -d)/w3_data_etl_pipeline_spark.zip"
(cd "$ROOT" && python -c "
import os, zipfile
with zipfile.ZipFile('$zip_path', 'w', zipfile.ZIP_DEFLATED) as z:
    for d, _, fs in os.walk('w3_data_etl_pipeline_spark'):
        for f in fs:
            if f.endswith('.py'):
                z.write(os.path.join(d, f))
")

# job selection: a leading jobs/<name>.py after the -- picks the
# entrypoint (run_cdc.py, maintain.py, follow_cdf.py); default stays
# the ingest job for backward compatibility
job="$ROOT/jobs/run_cdc.py"
if [[ $# -gt 0 ]]; then
  case "$1" in
    /*.py) job="$1"; shift;;
    jobs/*.py) job="$ROOT/$1"; shift;;
  esac
fi
exec spark-submit "${submit_args[@]}" \
    --py-files "$zip_path" \
    "$job" "$@"
