package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CatalogSink, Connectors}

/** Live connector round-trips, gated on what this environment actually
  * provides. Each test `assume`s its vendor jar (and, for remote services,
  * a connection in the environment) and cancels cleanly when absent — the
  * same pattern JdbcSpec uses with embedded Derby, extended to the vendors
  * whose jars don't ship here. The moment the right jar lands on the
  * classpath (and creds in the env for the cloud services), these stop
  * being canceled and prove the preset end-to-end.
  *
  * Env contract for the cloud vendors (all optional):
  *   - snowflake: GRAFT_SNOWFLAKE_URL/USER/PASSWORD/DATABASE/SCHEMA/WAREHOUSE
  *   - bigquery:  GRAFT_BIGQUERY_PROJECT/DATASET/GCS_BUCKET (ADC for auth)
  *   - mongodb:   GRAFT_MONGODB_URI (a reachable mongod)
  */
class ConnectorLiveSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def hasClass(cn: String): Boolean =
    try { Class.forName(cn); true } catch { case _: Throwable => false }

  test("iceberg: CatalogSink append/replace_partitions against a real Iceberg catalog") {
    assume(hasClass("org.apache.iceberg.spark.SparkCatalog"),
      "iceberg-spark-runtime jar absent")
    import spark.implicits._
    // a fresh local Iceberg catalog (v2 catalogs resolve lazily from conf,
    // so runtime configuration works)
    val wh = java.nio.file.Files.createTempDirectory("graft-iceberg").toString
    spark.conf.set("spark.sql.catalog.graft_ice",
      "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.graft_ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.graft_ice.warehouse", wh)
    val t = "graft_ice.db.events"

    val day1 = Seq(("2024-01-01", 1, "a"), ("2024-01-01", 2, "b"),
      ("2024-01-02", 3, "c")).toDF("day", "id", "v")
    CatalogSink(t, format = "iceberg", partitionBy = Seq("day")).write(day1)
    assert(spark.table(t).count() == 3)

    // replace_partitions: only day-02 is rewritten, day-01 untouched
    val day2 = Seq(("2024-01-02", 9, "z")).toDF("day", "id", "v")
    CatalogSink(t, format = "iceberg", partitionBy = Seq("day"),
      ifTableExists = "replace_partitions").write(day2)
    val rows = spark.table(t).orderBy("id")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(rows == Seq(("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-02", 9)))

    // snapshot history exists (real Iceberg metadata, not a path table)
    assert(spark.sql(s"SELECT * FROM $t.snapshots").count() >= 2)
  }

  test("snowflake: preset round-trip (needs spark-snowflake jar + GRAFT_SNOWFLAKE_* env)") {
    assume(hasClass("net.snowflake.spark.snowflake.DefaultSource"),
      "spark-snowflake jar absent")
    assume(sys.env.contains("GRAFT_SNOWFLAKE_URL"), "no live Snowflake configured")
    import spark.implicits._
    val params = Map(
      "sfUrl" -> sys.env("GRAFT_SNOWFLAKE_URL"),
      "sfUser" -> sys.env("GRAFT_SNOWFLAKE_USER"),
      "sfPassword" -> sys.env("GRAFT_SNOWFLAKE_PASSWORD"),
      "sfDatabase" -> sys.env("GRAFT_SNOWFLAKE_DATABASE"),
      "sfSchema" -> sys.env("GRAFT_SNOWFLAKE_SCHEMA"),
      "sfWarehouse" -> sys.env("GRAFT_SNOWFLAKE_WAREHOUSE"))
    val table = s"graft_live_${System.nanoTime()}"
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Connectors.snowflakeSink(params, table, ifTableExists = "replace").write(df)
    val back = Connectors.snowflakeSource(params,
        Seq(s"SELECT id, v FROM $table"))
      .load(spark, Map.empty).head
    assert(back.count() == 2)
  }

  test("bigquery: preset round-trip (needs spark-bigquery jar + GRAFT_BIGQUERY_* env)") {
    assume(hasClass("com.google.cloud.spark.bigquery.BigQueryRelationProvider"),
      "spark-bigquery jar absent")
    assume(sys.env.contains("GRAFT_BIGQUERY_PROJECT"), "no live BigQuery configured")
    import spark.implicits._
    val (proj, ds) = (sys.env("GRAFT_BIGQUERY_PROJECT"), sys.env("GRAFT_BIGQUERY_DATASET"))
    val table = s"graft_live_${System.nanoTime()}"
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    Connectors.bigQuerySink(proj, ds, table,
      sys.env("GRAFT_BIGQUERY_GCS_BUCKET"), ifTableExists = "replace").write(df)
    val back = Connectors.bigQuerySource(proj, ds, Seq(table))
      .load(spark, Map.empty).head
    assert(back.count() == 2)
  }

  test("mongodb: preset round-trip incl. update_existing upsert (needs jar + GRAFT_MONGODB_URI)") {
    assume(hasClass("com.mongodb.spark.sql.connector.MongoTableProvider"),
      "mongo-spark-connector jar absent")
    assume(sys.env.contains("GRAFT_MONGODB_URI"), "no live mongod configured")
    import spark.implicits._
    val uri = sys.env("GRAFT_MONGODB_URI")
    val coll = s"graft_live_${System.nanoTime()}"
    Connectors.mongoSink(uri, "graft_test", coll)
      .write(Seq((1, "a"), (2, "b")).toDF("_id", "v"))
    // update_existing: same ids replace, not duplicate
    Connectors.mongoSink(uri, "graft_test", coll, idField = Some("_id"))
      .write(Seq((2, "b2"), (3, "c")).toDF("_id", "v"))
    val back = Connectors.mongoSource(uri, "graft_test", Seq(coll))
      .load(spark, Map.empty).head
    assert(back.count() == 3)
    assert(back.where(F.col("_id") === 2).select("v").head().getString(0) == "b2")
  }

  test("s3a: FileSource/FileSink round-trip over an object store (needs hadoop-aws + GRAFT_S3_* env)") {
    // same FileSource/FileSink code path as local files, exercised over a
    // real s3a:// URI the moment hadoop-aws lands on the classpath and an
    // endpoint (AWS or MinIO-compatible) is configured in the env:
    //   GRAFT_S3_BUCKET (required), GRAFT_S3_ENDPOINT (optional, for
    //   S3-compatible stores), GRAFT_S3_ACCESS_KEY/SECRET_KEY (optional,
    //   falls back to the default AWS provider chain)
    assume(hasClass("org.apache.hadoop.fs.s3a.S3AFileSystem"), "hadoop-aws jar absent")
    assume(sys.env.contains("GRAFT_S3_BUCKET"), "no object store configured")
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    sys.env.get("GRAFT_S3_ENDPOINT").foreach { ep =>
      conf.set("fs.s3a.endpoint", ep)
      conf.set("fs.s3a.path.style.access", "true")
    }
    sys.env.get("GRAFT_S3_ACCESS_KEY").foreach(conf.set("fs.s3a.access.key", _))
    sys.env.get("GRAFT_S3_SECRET_KEY").foreach(conf.set("fs.s3a.secret.key", _))
    val base = s"s3a://${sys.env("GRAFT_S3_BUCKET")}/graft_live_${System.nanoTime()}"
    val df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
    graft.sources.FileSink(s"$base/t", "parquet").write(df)
    val back = graft.sources.FileSource(s"$base/t", "parquet")
      .load(spark, Map.empty).head
    assert(back.count() == 3)
    // glob read over the same prefix (the wildcard path cloud sources use)
    val glob = graft.sources.FileSource(s"$base/*", "parquet")
      .load(spark, Map.empty).head
    assert(glob.count() == 3)
  }
}
