#!/usr/bin/env bash
# Fetch the connector jars that un-skip ConnectorLiveSpec's classpath-gated
# live round-trips (s3a, Iceberg, Snowflake, MongoDB, BigQuery). This
# environment has no egress, so the script is a no-op here by design — run
# it from any networked machine, then drop the jars into lib/ (sbt's
# unmanaged classpath) or onto the cluster classpath.
#
# Versions are pinned to the Spark 4.1 / Scala 2.13 line this repo builds
# against; bump them together with build.sbt.
set -euo pipefail

DEST="${1:-lib}"
mkdir -p "$DEST"

SPARK_BINARY="2.13"          # Scala binary version
HADOOP_AWS="3.4.1"           # matches Spark 4.x's bundled Hadoop client
ICEBERG="1.10.0"             # first iceberg line shipping a Spark 4.0 runtime
SNOWFLAKE_JDBC="3.19.0"
SNOWFLAKE_SPARK="3.1.1"
MONGO_SPARK="10.4.1"
MONGO_DRIVER="5.2.1"
BQ_CONNECTOR="0.42.0"

fetch() {
  # coursier resolves transitive deps; fall back to `cs` naming. Copies
  # are skip-if-present by hand: `cp -n` exits 1 on skip under newer
  # coreutils, which would kill the script via set -e on the first jar
  # that two coordinates share transitively (snowflake-jdbc, mongo driver)
  local coord="$1" cmd
  if command -v cs >/dev/null 2>&1; then cmd=cs
  elif command -v coursier >/dev/null 2>&1; then cmd=coursier
  else
    echo "need coursier (cs) on PATH — https://get-coursier.io" >&2
    exit 1
  fi
  "$cmd" fetch "$coord" | while read -r jar; do
    [ -e "$DEST/$(basename "$jar")" ] || cp "$jar" "$DEST"/
  done
}

# cloud filesystems (s3a://): hadoop-aws + the AWS SDK v2 bundle it needs
fetch "org.apache.hadoop:hadoop-aws:${HADOOP_AWS}"

# Iceberg catalog round-trips (CatalogSpec's gated real-Iceberg path)
fetch "org.apache.iceberg:iceberg-spark-runtime-4.0_${SPARK_BINARY}:${ICEBERG}"

# Snowflake (JDBC preset + spark-snowflake format)
fetch "net.snowflake:snowflake-jdbc:${SNOWFLAKE_JDBC}"
fetch "net.snowflake:spark-snowflake_${SPARK_BINARY}:${SNOWFLAKE_SPARK}"

# MongoDB spark connector + sync driver
fetch "org.mongodb.spark:mongo-spark-connector_${SPARK_BINARY}:${MONGO_SPARK}"
fetch "org.mongodb:mongodb-driver-sync:${MONGO_DRIVER}"

# BigQuery
fetch "com.google.cloud.spark:spark-bigquery-with-dependencies_${SPARK_BINARY}:${BQ_CONNECTOR}"

echo "jars in $DEST — set the GRAFT_LIVE_* env vars (see ConnectorLiveSpec)"
echo "and re-run: sbt \"testOnly graft.ConnectorLiveSpec\""
