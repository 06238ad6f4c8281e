package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CatalogSink

/** CatalogSink semantics against the session catalog, mirroring the
  * reference's AWSGlue/pyiceberg behavior (file_outputs.py:97-420,
  * :1650-1708): auto-create, append vs replace vs replace_partitions,
  * union-by-name schema evolution, strict schema, incompatible-change
  * casting. */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private var n = 0
  private def freshTable(): String = { n += 1; s"graft_cat_${n}_${System.nanoTime()}" }

  import org.apache.spark.sql.DataFrame
  private def df(rows: Seq[(Int, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "v", "day")
  }

  test("auto-create then append keeps existing rows") {
    val t = freshTable()
    CatalogSink(t).write(df(Seq((1, "a", "d1"))))
    assert(spark.catalog.tableExists(t))
    CatalogSink(t).write(df(Seq((2, "b", "d2"))))
    assert(spark.table(t).count() == 2)
    spark.sql(s"DROP TABLE $t")
  }

  test("autoCreate=false on a missing table errors (auto_create_at parity)") {
    intercept[java.util.NoSuchElementException] {
      CatalogSink(freshTable(), autoCreate = false).write(df(Seq((1, "a", "d1"))))
    }
  }

  test("replace truncates an unpartitioned table, keeping its schema") {
    val t = freshTable()
    CatalogSink(t).write(df(Seq((1, "a", "d1"))))
    CatalogSink(t, ifTableExists = "replace").write(df(Seq((9, "z", "d9"))))
    val rows = spark.table(t).collect()
    assert(rows.length == 1 && rows.head.getInt(0) == 9)
    spark.sql(s"DROP TABLE $t")
  }

  test("replace on a partitioned sink is rejected (DECE39 parity)") {
    intercept[IllegalArgumentException] {
      CatalogSink("x", ifTableExists = "replace", partitionBy = Seq("day"))
    }
  }

  test("replace_partitions rewrites only incoming partitions") {
    val t = freshTable()
    val sink = CatalogSink(t, partitionBy = Seq("day"))
    sink.write(df(Seq((1, "a", "d1"), (2, "b", "d2"), (3, "c", "d3"))))
    // replace just d2 with new content; d1/d3 must survive
    CatalogSink(t, ifTableExists = "replace_partitions", partitionBy = Seq("day"))
      .write(df(Seq((20, "B", "d2"), (21, "B2", "d2"))))
    val got = spark.table(t).collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("day"))).sortBy(_._1)
    assert(got.toSeq == Seq((1, "d1"), (3, "d3"), (20, "d2"), (21, "d2")))
    spark.sql(s"DROP TABLE $t")
  }

  test("schema update: new incoming column evolves the table, old rows null") {
    val t = freshTable()
    CatalogSink(t).write(df(Seq((1, "a", "d1"))))
    val wider = df(Seq((2, "b", "d2"))).withColumn("score", F.lit(7.5))
    CatalogSink(t, schemaStrategy = "update").write(wider)
    val byId = spark.table(t).collect()
      .map(r => r.getAs[Int]("id") -> Option(r.getAs[Any]("score"))).toMap
    assert(byId(1).isEmpty && byId(2).contains(7.5))
    spark.sql(s"DROP TABLE $t")
  }

  test("schema update: missing incoming column is null-filled (union by name)") {
    val t = freshTable()
    CatalogSink(t).write(df(Seq((1, "a", "d1"))))
    import spark.implicits._
    CatalogSink(t).write(Seq((2, "d2")).toDF("id", "day")) // no "v"
    val r2 = spark.table(t).where("id = 2").head()
    assert(r2.getAs[String]("v") == null && r2.getAs[String]("day") == "d2")
    spark.sql(s"DROP TABLE $t")
  }

  test("strict schema rejects new columns") {
    val t = freshTable()
    CatalogSink(t).write(df(Seq((1, "a", "d1"))))
    val wider = df(Seq((2, "b", "d2"))).withColumn("extra", F.lit(1))
    intercept[IllegalArgumentException] {
      CatalogSink(t, schemaStrategy = "strict").write(wider)
    }
    spark.sql(s"DROP TABLE $t")
  }

  test("type conflict errors unless allowIncompatibleChanges casts") {
    val t = freshTable()
    CatalogSink(t).write(df(Seq((1, "a", "d1"))))
    import spark.implicits._
    val conflicting = Seq(("2", "b", "d2")).toDF("id", "v", "day") // id as string
    intercept[IllegalArgumentException] {
      CatalogSink(t).write(conflicting)
    }
    CatalogSink(t, allowIncompatibleChanges = true).write(conflicting)
    assert(spark.table(t).where("id = 2").count() == 1)
    spark.sql(s"DROP TABLE $t")
  }
}
