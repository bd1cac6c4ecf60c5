#!/bin/sh
# Package the library for `spark-submit --py-files` (north rule: cluster
# deployment at N and 4N executors).  Pure-Python package, no build step:
# zip the import root so executors can `import leidenalg_spark`.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/leidenalg_spark.zip
# -x: no caches; the zip root must contain the package directory itself
zip -qr dist/leidenalg_spark.zip leidenalg_spark -x '*__pycache__*'
echo "dist/leidenalg_spark.zip:"
unzip -l dist/leidenalg_spark.zip | tail -2
