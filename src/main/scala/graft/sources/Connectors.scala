package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Connector presets mirroring the reference's six add-on connector
  * packages (`/root/reference/connectors/python/tabsdata_*`). Each reduces
  * the connector to the Spark-native equivalent:
  *
  *   - MSSQL / Databricks SQL → Spark's built-in JDBC data source with the
  *     vendor URL/driver preset ([[JdbcSource]]/[[JdbcSink]] underneath);
  *   - Snowflake / BigQuery / MongoDB → `spark.read.format(...)` against
  *     the vendor's published Spark connector format name (the jar must be
  *     on the cluster classpath — none ship in this environment, so specs
  *     assert the constructed plan inputs, not live round-trips);
  *   - Salesforce → a staged-extract source: an injectable fetch step
  *     (the SOQL API call, which Spark cannot express) lands record
  *     batches as local JSONL, and the distributed part — schema
  *     inference, incremental `$lastModified` watermarking — is Spark.
  *
  * Where the reference funnels rows through a single Python process
  * (pyodbc cursor chunks, `connectors/python/tabsdata_mssql/_connector
  * .py:35-280`), these presets keep Spark's parallel JDBC partitioning
  * available via `partitionColumn`/`numPartitions` options, so a 100 TB
  * extract fans out across executors instead of one cursor.
  */
object Connectors {

  /** Vendor JDBC preset: URL prefix + driver class + default options.
    * `partitionOptions` is the parallel-read escape hatch: pass
    * partitionColumn/lowerBound/upperBound/numPartitions through to Spark
    * so the scan shards across executors. */
  final case class JdbcVendor(
      name: String,
      urlPrefix: String,
      driver: String,
      defaults: Map[String, String] = Map.empty)

  /** SQL Server (reference `tabsdata_mssql/_connector.py:35` MSSQLSource:
    * connection_string + query list + `$offset$`-style initial_values). */
  val MsSql: JdbcVendor = JdbcVendor(
    "mssql", "jdbc:sqlserver://",
    "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    Map("encrypt" -> "true", "trustServerCertificate" -> "false"))

  /** MariaDB (reference `sql_outputs.py:800-816` MariaDBDestination over
    * a `mariadb://host:port/db` URI; user `charset=`/`collation=` query
    * params ride the URI — rs output_mariadb_with_{charset,collation}). */
  val MariaDb: JdbcVendor = JdbcVendor(
    "mariadb", "jdbc:mariadb://", "org.mariadb.jdbc.Driver")

  /** The reference's default MariaDB collation, applied to every MariaDB
    * URI that does not already choose one
    * (`_tabsserver/function/sql_utils.py:9` MARIADB_COLLATION). */
  val MariaDbCollation = "utf8mb4_unicode_520_ci"

  /** Normalize a MariaDB URI the way the reference's writer does
    * (`sql_utils.py:12-24` add_mariadb_collation): if no `collation`
    * parameter is present, append `collation=utf8mb4_unicode_520_ci` —
    * with `&` when the URI already has a query string (e.g. a user
    * `charset=utf8mb4`), `?` otherwise. A user-chosen collation (or any
    * URI already mentioning one) passes through untouched. */
  def addMariadbCollation(uri: String): String =
    if (uri.contains("collation")) uri
    else if (uri.contains("?")) s"$uri&collation=$MariaDbCollation"
    else s"$uri?collation=$MariaDbCollation"

  /** Databricks SQL warehouse (reference `tabsdata_databricks/_connector
    * .py:62` targets a warehouse + unity catalog volume; over JDBC the
    * warehouse is the `httpPath`). */
  val Databricks: JdbcVendor = JdbcVendor(
    "databricks", "jdbc:databricks://",
    "com.databricks.client.jdbc.Driver")

  /** Snowflake JDBC fallback (the format-based preset below is preferred
    * when the spark-snowflake jar is present). */
  val Snowflake: JdbcVendor = JdbcVendor(
    "snowflake", "jdbc:snowflake://",
    "net.snowflake.client.jdbc.SnowflakeDriver")

  /** Build a [[JdbcSource]] for a vendor: one query per output table,
    * `$offset$` substitution for incremental loads (same contract the
    * generic SQL sources use, reference `sql_inputs.py:752-764`). */
  def jdbcSource(vendor: JdbcVendor, hostAndDb: String, queries: Seq[String],
      user: String, password: String,
      fetchSize: Int = 50000,
      extra: Map[String, String] = Map.empty): JdbcSource =
    JdbcSource(
      url = vendor.urlPrefix + hostAndDb,
      queries = queries,
      properties = vendor.defaults ++ Map(
        "driver" -> vendor.driver, "user" -> user, "password" -> password,
        // the reference's chunk_size (rows fetched per cursor round-trip,
        // `_connector.py:44`); Spark's JDBC reader knob is fetchsize
        "fetchsize" -> fetchSize.toString) ++ extra)

  /** Build a [[JdbcSink]] for a vendor. `ifTableExists` follows the
    * reference's append/replace strategy (`_connector.py:294`):
    * append → JDBC append; replace → overwrite (drop + recreate). */
  def jdbcSink(vendor: JdbcVendor, hostAndDb: String, table: String,
      user: String, password: String, ifTableExists: String = "append",
      batchSize: Int = 50000,
      extra: Map[String, String] = Map.empty): JdbcSink = {
    val mode = ifTableExists match {
      case "append"  => "append"
      case "replace" => "overwrite"
      case other => throw new IllegalArgumentException(
        s"if_table_exists must be append|replace, got: $other")
    }
    // the reference normalizes ONLY the destination URI (`sql_outputs
    // .py:813-814`): the driver misbehaves without an explicit collation
    val base = vendor.urlPrefix + hostAndDb
    JdbcSink(
      url = if (vendor.name == "mariadb") addMariadbCollation(base) else base,
      table = table,
      mode = mode,
      properties = vendor.defaults ++ Map(
        "driver" -> vendor.driver, "user" -> user, "password" -> password,
        // chunk_size analog on the write path (`_connector.py:295`):
        // rows per JDBC executeBatch
        "batchsize" -> batchSize.toString) ++ extra)
  }

  /** Format-based source: `spark.read.format(fmt).options(...)`, one
    * entry per output table. Covers the vendors whose Spark connector is
    * a DataSourceV2 format (snowflake, bigquery, mongodb). */
  final case class FormatSource(
      format: String,
      tables: Seq[Map[String, String]],
      common: Map[String, String] = Map.empty) extends Source {
    override def load(spark: SparkSession,
        offsets: Map[String, String]): Seq[DataFrame] =
      tables.map(t => spark.read.format(format).options(common ++ t).load())
  }

  final case class FormatSink(
      format: String,
      options: Map[String, String],
      mode: String = "append") extends Sink {
    override def write(df: DataFrame): Unit =
      df.write.format(format).options(options).mode(mode).save()
  }

  /** Snowflake via the spark-snowflake connector format (reference
    * `tabsdata_snowflake/_connector.py:52` SnowflakeDestination:
    * connection_parameters dict + destination tables + append/replace). */
  def snowflakeSink(connectionParameters: Map[String, String], table: String,
      ifTableExists: String = "append"): FormatSink =
    FormatSink("snowflake",
      connectionParameters ++ Map("dbtable" -> table),
      if (ifTableExists == "replace") "overwrite" else "append")

  def snowflakeSource(connectionParameters: Map[String, String],
      queries: Seq[String]): FormatSource =
    FormatSource("snowflake", queries.map(q => Map("query" -> q)),
      connectionParameters)

  /** BigQuery via the spark-bigquery connector (reference
    * `tabsdata_bigquery/_connector.py:38` BigQueryConn stages to GCS then
    * loads; the Spark connector's `writeMethod=indirect` does the same
    * staging internally — `temporaryGcsBucket` is the `gcs_folder`). */
  def bigQuerySink(project: String, dataset: String, table: String,
      gcsStagingBucket: String, ifTableExists: String = "append"): FormatSink =
    FormatSink("bigquery",
      Map(
        "table" -> s"$project.$dataset.$table",
        "writeMethod" -> "indirect",
        "temporaryGcsBucket" -> gcsStagingBucket),
      if (ifTableExists == "replace") "overwrite" else "append")

  def bigQuerySource(project: String, dataset: String,
      tables: Seq[String]): FormatSource =
    FormatSource("bigquery",
      tables.map(t => Map("table" -> s"$project.$dataset.$t")))

  /** MongoDB via the mongo-spark connector (reference
    * `tabsdata_mongodb/_connector.py:31` MongoDBDestination: uri +
    * (collection, id-field) pairs; `update_existing` → upsert on the id
    * field via the connector's `idFieldList` replace semantics). */
  def mongoSink(uri: String, database: String, collection: String,
      idField: Option[String] = None,
      ifCollectionExists: String = "append",
      updateExisting: Boolean = true): FormatSink =
    FormatSink("mongodb",
      Map(
        "connection.uri" -> uri,
        "database" -> database,
        "collection" -> collection) ++
        idField.map(f => Map(
          "idFieldList" -> f,
          // reference `update_existing` (`_connector.py:41,85`): true →
          // replace documents matching the id field, false → insert-only
          "operationType" -> (if (updateExisting) "replace" else "insert"))
        ).getOrElse(Map.empty),
      if (ifCollectionExists == "replace") "overwrite" else "append")

  def mongoSource(uri: String, database: String,
      collections: Seq[String]): FormatSource =
    FormatSource("mongodb",
      collections.map(c => Map("collection" -> c)),
      Map("connection.uri" -> uri, "database" -> database))

  /** Salesforce staged-extract source (reference `tabsdata_salesforce/
    * _connector.py:154` SalesforceSource: SOQL queries with a
    * `$lastModified` token resolved against the `SystemModstamp`
    * watermark).
    *
    * The API pull itself is not a Spark operation — the reference runs it
    * through simple-salesforce in the function host. Here `fetch` is that
    * injectable step: (resolved SOQL) → path of a JSONL extract. Spark
    * then owns everything distributed: reading the extract, schema
    * inference, and advancing the watermark via max(SystemModstamp). */
  final case class SalesforceSource(
      queries: Seq[String],
      fetch: String => String,
      initialLastModified: String = "1970-01-01T00:00:00.000+0000")
      extends Source {
    val LastModifiedToken = "$lastModified"
    val LastModifiedColumn = "SystemModstamp"

    override def load(spark: SparkSession,
        offsets: Map[String, String]): Seq[DataFrame] = {
      val watermark = offsets.getOrElse("last_modified", initialLastModified)
      queries.map { q =>
        val soql = q.replace(LastModifiedToken, watermark)
        spark.read.json(fetch(soql))
      }
    }

    /** New watermark = max SystemModstamp across this pull (reference
      * advances `initial_values` the same way per execution). */
    override def nextOffsets(dfs: Seq[DataFrame]): Map[String, String] = {
      val maxes = dfs.flatMap { df =>
        if (df.columns.contains(LastModifiedColumn))
          Option(df.agg(org.apache.spark.sql.functions
            .max(LastModifiedColumn)).head.getString(0))
        else None
      }
      if (maxes.isEmpty) Map.empty
      else Map("last_modified" -> maxes.max)
    }
  }
}
