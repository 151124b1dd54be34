#!/usr/bin/env bash
# Package consult_spark for spark-submit --py-files.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/consult_spark.zip
zip -qr dist/consult_spark.zip consult_spark jobs -x '*__pycache__*'
echo "dist/consult_spark.zip:"
unzip -l dist/consult_spark.zip | tail -3
