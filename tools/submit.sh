#!/usr/bin/env bash
# Package the engine and run the flagship pipeline via spark-submit
# --py-files (the north rule's deployment surface).  On a real cluster,
# replace --master with yarn/k8s and point --input at the Iceberg table.
#
# Usage: tools/submit.sh [input_parquet] [output_dir] [master]
set -euo pipefail
cd "$(dirname "$0")/.."

INPUT="${1:-/root/testdata/sf0.01/documents.parquet}"
OUTPUT="${2:-/tmp/rtc_submit_out}"
MASTER="${3:-local[8]}"

ZIP=/tmp/rabbittclust_spark.zip
rm -f "$ZIP"
python - <<'EOF'
import zipfile, pathlib
zf = zipfile.ZipFile('/tmp/rabbittclust_spark.zip', 'w', zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path('rabbittclust_spark').rglob('*.py')):
    zf.write(p, p.as_posix())
zf.close()
print('packaged', '/tmp/rabbittclust_spark.zip')
EOF

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.shuffle.partitions=32 \
  --py-files "$ZIP" \
  tools/run_pipeline.py --input "$INPUT" --output "$OUTPUT"
