#!/bin/sh
# Package the engine for spark-submit --py-files (north rule ship shape).
#
#   sh tools/package_pyfiles.sh            # -> dist/traffic_engine_spark.zip
#   spark-submit --py-files dist/traffic_engine_spark.zip \
#       --conf spark.sql.adaptive.enabled=true \
#       --conf spark.sql.adaptive.skewJoin.enabled=true \
#       --conf spark.sql.execution.arrow.pyspark.enabled=true \
#       your_job.py
#
# The package is pure Python + numpy/pandas (no native builds), so the zip
# is executor-importable as-is.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/traffic_engine_spark.zip
python -c "
import zipfile, pathlib
zf = zipfile.ZipFile('dist/traffic_engine_spark.zip', 'w', zipfile.ZIP_DEFLATED)
for p in sorted(pathlib.Path('traffic_engine_spark').rglob('*.py')):
    zf.write(p)
zf.close()
print('wrote dist/traffic_engine_spark.zip')
"
