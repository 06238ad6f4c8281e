package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Connectors, JdbcSink, JdbcSource}

/** Live JDBC round-trips against embedded Derby (ships in /opt/spark/jars
  * for the Hive metastore, so it is on the classpath everywhere Spark is).
  * Proves the JdbcSource/JdbcSink paths the reference exercises against
  * MySQL/MariaDB/Oracle/Postgres (`_io/inputs/sql_inputs.py`,
  * `_io/outputs/sql_outputs.py:900`) actually execute: append/replace
  * writes, query reads, and `$offset$` incremental re-runs
  * (sql_inputs.py:752-764). */
class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def freshDb(): String = {
    val dir = Files.createTempDirectory("graft-derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  test("JdbcSink append + JdbcSource query round-trip") {
    import spark.implicits._
    val url = freshDb()
    val df = Seq((1, "alpha", 10.5), (2, "beta", 20.0), (3, "gamma", 7.25))
      .toDF("id", "name", "score")

    JdbcSink(url, "items", mode = "append").write(df)
    val back = JdbcSource(url,
      Seq("""SELECT "id", "name", "score" FROM items"""))
      .load(spark, Map.empty).head
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).sortBy(_._1)
    assert(back.toSeq == Seq((1, "alpha", 10.5), (2, "beta", 20.0), (3, "gamma", 7.25)))

    // append again → rows double
    JdbcSink(url, "items", mode = "append").write(df)
    val n = JdbcSource(url, Seq("""SELECT COUNT(*) AS n FROM items"""))
      .load(spark, Map.empty).head.head.getInt(0) // Derby COUNT(*) is INTEGER
    assert(n == 6)
  }

  test("JdbcSink replace (overwrite) drops previous contents") {
    import spark.implicits._
    val url = freshDb()
    JdbcSink(url, "t", mode = "append")
      .write(Seq((1, "old")).toDF("id", "v"))
    JdbcSink(url, "t", mode = "overwrite")
      .write(Seq((7, "new"), (8, "newer")).toDF("id", "v"))
    val rows = JdbcSource(url, Seq("""SELECT "id", "v" FROM t"""))
      .load(spark, Map.empty).head
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((7, "new"), (8, "newer")))
  }

  test("named :param substitution — prefix collision resolved longest-first") {
    import spark.implicits._
    val url = freshDb()
    JdbcSink(url, "vals", mode = "append").write(
      (1 to 6).map(i => (i, s"v$i")).toDF("id", "v"))
    // :num and :number share a prefix: shortest-first substitution would
    // mangle ":number" into "1ber" and fail in the database
    val rows = JdbcSource(url,
      Seq("""SELECT "id" FROM vals WHERE "id" > :num AND "id" < :number"""),
      initialValues = Map("num" -> "1", "number" -> "5"))
      .load(spark, Map.empty).head
      .collect().map(_.getInt(0)).sorted
    assert(rows.toSeq == Seq(2, 3, 4))
  }

  test(":param substitution is token-bounded — longer undeclared tokens untouched") {
    import spark.implicits._
    val url = freshDb()
    JdbcSink(url, "vals2", mode = "append").write(
      (1 to 4).map(i => (i, s"v$i")).toDF("id", "v"))
    // ':numx' lives inside a string literal: a plain substring replace of
    // ':num' would corrupt it to '5x'; the bounded form must leave it be
    val rows = JdbcSource(url,
      Seq("""SELECT "id", ':numx' AS tag FROM vals2 WHERE "id" > :num"""),
      initialValues = Map("num" -> "2"))
      .load(spark, Map.empty).head
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((3, ":numx"), (4, ":numx")))
  }

  test("schema-qualified destination table (rs output_postgres_schema)") {
    import spark.implicits._
    val url = freshDb()
    // the reference writes into an existing database schema; Derby schemas
    // exist once created, then a qualified dbtable routes the write
    val conn = DriverManager.getConnection(url)
    try conn.createStatement().execute("CREATE SCHEMA WAREHOUSE")
    finally conn.close()
    JdbcSink(url, "WAREHOUSE.stock", mode = "append")
      .write(Seq(("a", 4), ("b", 9)).toDF("sku", "qty"))
    val back = JdbcSource(url,
      Seq("""SELECT "sku", "qty" FROM WAREHOUSE.stock"""))
      .load(spark, Map.empty).head
      .collect().map(r => (r.getString(0), r.getInt(1))).sortBy(_._1)
    assert(back.toSeq == Seq(("a", 4), ("b", 9)))
  }

  test("partitioned JDBC read: stride scan equals single-cursor read, fans out") {
    import spark.implicits._
    // every 100 TB warehouse ingest rides partitionColumn/numPartitions —
    // prove the pass-through against live Derby: same rows as the single
    // read, and the scan actually splits into numPartitions JDBC strides
    val url = freshDb()
    JdbcSink(url, "wide", mode = "append")
      .write((1 to 97).map(i => (i, s"v$i")).toDF("id", "v"))
    val q = """SELECT "id", "v" FROM wide WHERE "id" <= 90"""
    val single = JdbcSource(url, Seq(q)).load(spark, Map.empty).head
    val parted = JdbcSource(url, Seq(q), properties = Map(
        "partitionColumn" -> "id", "lowerBound" -> "1",
        "upperBound" -> "91", "numPartitions" -> "4"))
      .load(spark, Map.empty).head
    assert(parted.rdd.getNumPartitions == 4, // the fan-out is real
      s"expected 4 JDBC stride partitions, got ${parted.rdd.getNumPartitions}")
    assert(parted.collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
      == single.collect().map(r => (r.getInt(0), r.getString(1))).sorted.toSeq)
    assert(parted.count() == 90)
  }

  test("JdbcSource $offset$ substitution drives incremental re-runs") {
    import spark.implicits._
    val url = freshDb()
    JdbcSink(url, "events", mode = "append")
      .write(Seq((1, "a"), (2, "b"), (3, "c")).toDF("seq", "payload"))

    val src = JdbcSource(url,
      Seq("""SELECT "seq", "payload" FROM events WHERE "seq" > $offset$"""))

    // first run: initial offset 0 → all rows
    val first = src.load(spark, Map.empty).head
    assert(first.count() == 3)

    // simulate the engine persisting max(seq) as the new offset, then new
    // rows arriving upstream
    JdbcSink(url, "events", mode = "append")
      .write(Seq((4, "d"), (5, "e")).toDF("seq", "payload"))
    val second = src.load(spark, Map("offset" -> "3")).head
      .collect().map(_.getInt(0)).sorted
    assert(second.toSeq == Seq(4, 5))
  }

  test("connector presets construct vendor JDBC configs") {
    val src = Connectors.jdbcSource(Connectors.MsSql,
      "host:1433;databaseName=db", Seq("SELECT 1"), "u", "p")
    assert(src.url == "jdbc:sqlserver://host:1433;databaseName=db")
    assert(src.properties("driver") == "com.microsoft.sqlserver.jdbc.SQLServerDriver")
    assert(src.properties("encrypt") == "true")

    val snk = Connectors.jdbcSink(Connectors.Databricks,
      "host:443/default;httpPath=/sql/1.0/warehouses/abc", "out_t",
      "token", "secret", ifTableExists = "replace")
    assert(snk.mode == "overwrite")
    assert(snk.url.startsWith("jdbc:databricks://"))
    intercept[IllegalArgumentException] {
      Connectors.jdbcSink(Connectors.MsSql, "h", "t", "u", "p", "upsert")
    }

    val sf = Connectors.snowflakeSink(
      Map("sfUrl" -> "acct.snowflakecomputing.com", "sfWarehouse" -> "wh"),
      "target", ifTableExists = "append")
    assert(sf.format == "snowflake" && sf.mode == "append")
    assert(sf.options("dbtable") == "target")

    val bq = Connectors.bigQuerySink("proj", "ds", "tbl", "gs://stage")
    assert(bq.options("table") == "proj.ds.tbl")
    assert(bq.options("temporaryGcsBucket") == "gs://stage")

    val mg = Connectors.mongoSink("mongodb://h", "db", "coll",
      idField = Some("_id"), ifCollectionExists = "replace")
    assert(mg.options("operationType") == "replace" && mg.mode == "overwrite")
  }

  test("mariadb destination URI: collation default + user charset/collation " +
      "(rs output_mariadb_with_charset / output_mariadb_with_collation)") {
    // reference `sql_utils.py:12-24`: the writer appends the default
    // collation unless the URI already picks one — `?` vs `&` joining
    // depends on whether a query string exists
    assert(Connectors.addMariadbCollation("mariadb://127.0.0.1:3307/testing")
      == "mariadb://127.0.0.1:3307/testing?collation=utf8mb4_unicode_520_ci")
    // the charset golden: user charset param rides untouched, collation
    // appended with '&' (`sql_outputs.py:800-816` MariaDBDestination URI)
    assert(Connectors.addMariadbCollation(
        "mariadb://127.0.0.1:3307/testing?charset=utf8mb4")
      == "mariadb://127.0.0.1:3307/testing?charset=utf8mb4" +
        "&collation=utf8mb4_unicode_520_ci")
    // the collation golden: a user collation wins — URI unchanged
    val userChoice = "mariadb://127.0.0.1:3307/testing?collation=utf8mb4_bin"
    assert(Connectors.addMariadbCollation(userChoice) == userChoice)
    // the sink preset applies the normalization (destinations only, like
    // the reference); sources pass the URI through untouched
    val snk = Connectors.jdbcSink(Connectors.MariaDb,
      "127.0.0.1:3307/testing?charset=utf8mb4", "out_t", "u", "p")
    assert(snk.url == "jdbc:mariadb://127.0.0.1:3307/testing" +
      "?charset=utf8mb4&collation=utf8mb4_unicode_520_ci")
    assert(snk.properties("driver") == "org.mariadb.jdbc.Driver")
    val src = Connectors.jdbcSource(Connectors.MariaDb,
      "127.0.0.1:3307/testing", Seq("SELECT 1"), "u", "p")
    assert(src.url == "jdbc:mariadb://127.0.0.1:3307/testing")
  }

  test("connector chunk-size tails: fetchsize/batchsize presets + live batched write") {
    // preset surface: the reference's chunk_size maps to Spark's
    // fetchsize (read) and batchsize (write) JDBC knobs
    val src = Connectors.jdbcSource(Connectors.MsSql, "h:1433;databaseName=db",
      Seq("SELECT 1"), "u", "p", fetchSize = 10000)
    assert(src.properties("fetchsize") == "10000")
    val snk = Connectors.jdbcSink(Connectors.MsSql, "h", "t", "u", "p",
      batchSize = 2500)
    assert(snk.properties("batchsize") == "2500")
    // mongo update_existing=false → insert-only operation
    val mg = Connectors.mongoSink("mongodb://h", "db", "c",
      idField = Some("_id"), updateExisting = false)
    assert(mg.options("operationType") == "insert")

    // and a live write through a small batchsize still lands every row
    import spark.implicits._
    val url = freshDb()
    JdbcSink(url, "chunked", mode = "append",
        properties = Map("batchsize" -> "3"))
      .write((1 to 10).map(i => (i, s"r$i")).toDF("id", "v"))
    val n = JdbcSource(url, Seq("""SELECT COUNT(*) AS n FROM chunked"""))
      .load(spark, Map.empty).head.head().getInt(0)
    assert(n == 10)
  }

  test("salesforce staged-extract source: $lastModified token + watermark") {
    val dir = Files.createTempDirectory("graft-sf").toString
    val captured = scala.collection.mutable.ArrayBuffer[String]()
    val fetch: String => String = { soql =>
      captured += soql
      val p = s"$dir/extract.jsonl"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        """{"Id":"001","Name":"n1","SystemModstamp":"2024-01-02T00:00:00.000+0000"}
          |{"Id":"002","Name":"n2","SystemModstamp":"2024-03-04T00:00:00.000+0000"}
          |""".stripMargin)
      p
    }
    val src = Connectors.SalesforceSource(
      Seq("SELECT Id, Name FROM Account WHERE SystemModstamp > $lastModified"),
      fetch, initialLastModified = "2023-12-31T00:00:00.000+0000")

    val dfs = src.load(spark, Map.empty)
    assert(captured.head ==
      "SELECT Id, Name FROM Account WHERE SystemModstamp > 2023-12-31T00:00:00.000+0000")
    assert(dfs.head.count() == 2)
    // watermark advances to the max SystemModstamp seen
    assert(src.nextOffsets(dfs) ==
      Map("last_modified" -> "2024-03-04T00:00:00.000+0000"))
    // a later run substitutes the persisted watermark
    src.load(spark, Map("last_modified" -> "2024-03-04T00:00:00.000+0000"))
    assert(captured.last.contains("> 2024-03-04T00:00:00.000+0000"))
  }

  test("derby is usable directly for seeding (sanity)") {
    val url = freshDb()
    val c = DriverManager.getConnection(url)
    try {
      c.createStatement().execute("CREATE TABLE raw (k INT, v VARCHAR(10))")
      c.createStatement().execute("INSERT INTO raw VALUES (1, 'x'), (2, 'y')")
    } finally c.close()
    val rows = JdbcSource(url, Seq("""SELECT k, v FROM raw"""))
      .load(spark, Map.empty).head.count()
    assert(rows == 2)
  }
}
