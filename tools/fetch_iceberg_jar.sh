#!/usr/bin/env bash
# Vendor the public Apache Iceberg Spark runtime jar into vendor/jars/
# so tests/test_iceberg_integration.py runs instead of skipping.
#
# This sandbox has no network, so the jar cannot be committed here; on
# any networked machine run this once from the repo root:
#
#   bash tools/fetch_iceberg_jar.sh
#
# The test conftest adds every vendor/jars/*.jar to spark.jars at
# session creation, and sources/io.iceberg_available() then reports
# true — the two-snapshot pinned-read / incremental-resume test
# (round-4 VERDICT item 6) executes for real.
set -euo pipefail

# Spark 4.x / Scala 2.13 runtime line (public Maven Central artifact).
# Bump ICEBERG_VERSION as releases appear; 1.8+ ships Spark 4 support.
ICEBERG_VERSION="${ICEBERG_VERSION:-1.10.0}"
SPARK_LINE="4.0"
SCALA="2.13"
ART="iceberg-spark-runtime-${SPARK_LINE}_${SCALA}"
URL="https://repo1.maven.org/maven2/org/apache/iceberg/${ART}/${ICEBERG_VERSION}/${ART}-${ICEBERG_VERSION}.jar"

cd "$(dirname "$0")/.."
mkdir -p vendor/jars
echo "fetching ${URL}"
curl -fSL -o "vendor/jars/${ART}-${ICEBERG_VERSION}.jar" "${URL}"
# verify against the Maven-published checksum (authenticity pin)
curl -fsSL "${URL}.sha1" > /tmp/iceberg_jar.sha1
echo "$(cat /tmp/iceberg_jar.sha1)  vendor/jars/${ART}-${ICEBERG_VERSION}.jar" \
  | sha1sum -c -
echo "OK — rerun: python -m pytest tests/test_iceberg_integration.py -v"
