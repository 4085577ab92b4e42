#!/bin/sh
# spark-submit deployment example (north rule: 'runs via spark-submit
# --py-files on a multi-executor cluster').
#
#   ./scripts/submit.sh <pages_parquet_dir> [extra cli args...]
#
# Packages linguistjs_spark (code + the pinned metadata snapshot) into a zip
# shipped to executors; the CLI main drives the pipeline. On a real cluster
# replace --master and add executor sizing; everything else is identical.
set -eu
REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
ZIP="/tmp/linguistjs_spark.zip"
(cd "$REPO_DIR" && rm -f "$ZIP" && python -c "
import shutil, zipfile, os
with zipfile.ZipFile('$ZIP', 'w') as z:
    for root, _, files in os.walk('linguistjs_spark'):
        for f in files:
            if not f.endswith('.pyc'):
                p = os.path.join(root, f)
                z.write(p, p)
")
exec spark-submit \
  --master "${SPARK_MASTER:-local[*]}" \
  --py-files "$ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$REPO_DIR/scripts/run_quality_filter.py" "$@"
