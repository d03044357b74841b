#!/usr/bin/env bash
# Build the --py-files zip for spark-submit deployment.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/crusty_core_spark.zip
zip -qr dist/crusty_core_spark.zip crusty_core_spark -x '*__pycache__*'
echo "dist/crusty_core_spark.zip"
