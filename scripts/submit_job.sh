#!/usr/bin/env bash
# Cluster launch (north rule: spark-submit --py-files on multi-executor
# clusters at N and 4N executors).  Packages the engine as a zip and
# submits the KG job against an Iceberg transcripts table.
#
#   ./scripts/submit_job.sh <master> <num_executors> <transcripts_table> <warehouse_uri>
#
# Local smoke: ./scripts/submit_job.sh "local[8]" 0 synth:200 /tmp/kg_wh
set -euo pipefail

MASTER="${1:-local[8]}"
NUM_EXECUTORS="${2:-0}"
INPUT="${3:-synth:200}"
WAREHOUSE="${4:-/tmp/kg_warehouse}"

REPO="$(cd "$(dirname "$0")/.." && pwd)"
PKG_ZIP="$(mktemp -d)/ie_t5_spark.zip"
(cd "$REPO" && python - <<EOF
import zipfile, os
with zipfile.ZipFile("$PKG_ZIP", "w") as z:
    for root, _, files in os.walk("information_extraction_t5_spark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("packaged", "$PKG_ZIP")
EOF
)

EXEC_ARGS=()
if [ "$NUM_EXECUTORS" -gt 0 ]; then
  EXEC_ARGS=(--num-executors "$NUM_EXECUTORS"
             --executor-cores 4 --executor-memory 8g)
fi

exec spark-submit \
  --master "$MASTER" \
  "${EXEC_ARGS[@]}" \
  --py-files "$PKG_ZIP" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  "$REPO/scripts/run_kg_job.py" \
  --input "$INPUT" --warehouse "$WAREHOUSE"
