#!/bin/sh
# Build the --py-files zip for spark-submit (see jobs/run_pipeline_job.py).
set -e
cd "$(dirname "$0")/.."
rm -f otel_arrow_adapter_spark.zip
zip -qr otel_arrow_adapter_spark.zip otel_arrow_adapter_spark -i '*.py'
echo "wrote $(pwd)/otel_arrow_adapter_spark.zip"
