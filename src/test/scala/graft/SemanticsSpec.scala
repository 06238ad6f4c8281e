package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TableFrame
import graft.td

/** Differential tests for the Polars-vs-Spark semantics deltas SURVEY §7.3a
  * flags as hard/risky: NaN equality in group keys and joins, -0.0
  * normalization, null-vs-NaN ordering, strict-cast behavior, integer
  * overflow, maintain_order stability, and UTC timestamp round-trips. Each
  * test pins the engine's actual behavior so a Spark upgrade or conf change
  * that silently shifts semantics fails loudly here. */
class SemanticsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("NaN values form a single group key (Polars groups NaN==NaN)") {
    import spark.implicits._
    val df = Seq(1.0, Double.NaN, Double.NaN, 2.0).toDF("v")
    val groups = TableFrame.fromDF(df).group_by("v").len().df.collect()
    assert(groups.length == 3) // 1.0, 2.0, NaN — not two NaN groups
    val nanRow = groups.find(r => r.getDouble(0).isNaN).get
    assert(nanRow.getLong(1) == 2L)
  }

  test("NaN keys match in equi-joins (Spark normalizes like Polars)") {
    import spark.implicits._
    val l = Seq(Double.NaN, 1.0).toDF("k")
    val r = Seq((Double.NaN, "found"), (2.0, "other")).toDF("k", "tag")
    val joined = TableFrame.fromDF(l)
      .join(TableFrame.fromDF(r), on = Seq("k"), how = "inner")
      .df.collect()
    assert(joined.length == 1 && joined.head.getString(1) == "found")
  }

  test("-0.0 and 0.0 group together and join to each other") {
    import spark.implicits._
    val df = Seq(0.0, -0.0).toDF("v")
    assert(TableFrame.fromDF(df).group_by("v").len().df.count() == 1)
  }

  test("sort places nulls first on asc by default, NaN above all numbers") {
    import spark.implicits._
    val df = Seq[java.lang.Double](2.0, null, Double.NaN, 1.0).toDF("v")
    val asc = TableFrame.fromDF(df).sort(Seq("v")).df.collect()
      .map(r => if (r.isNullAt(0)) "null" else r.getDouble(0).toString)
    // Polars nulls_first on asc (SURVEY §7.3a); Spark: NaN > +Inf
    assert(asc.toSeq == Seq("null", "1.0", "2.0", "NaN"))
    val ascLast = TableFrame.fromDF(df).sort(Seq("v"), nullsLast = true).df.collect()
      .map(r => if (r.isNullAt(0)) "null" else r.getDouble(0).toString)
    assert(ascLast.toSeq == Seq("1.0", "2.0", "NaN", "null"))
  }

  test("null and NaN stay distinct through fill_null vs fill_nan") {
    import spark.implicits._
    val df = Seq[java.lang.Double](1.0, null, Double.NaN).toDF("v")
    val tf = TableFrame.fromDF(df)
    // fill_null leaves NaN; fill_nan leaves null
    val afterNull = tf.fill_null(-1.0).df.collect()
      .map(r => r.getDouble(0).toString).sorted
    assert(afterNull.count(_ == "NaN") == 1 && afterNull.contains("-1.0"))
    val afterNan = tf.fill_nan(-2.0).df.collect()
      .map(r => if (r.isNullAt(0)) "null" else r.getDouble(0).toString)
    assert(afterNan.count(_ == "null") == 1 && afterNan.contains("-2.0"))
  }

  test("non-strict cast nulls invalid values; strict cast under ANSI raises") {
    import spark.implicits._
    val df = Seq("12", "not-a-number").toDF("s")
    val lax = TableFrame.fromDF(df)
      .select(td.col("s").cast(IntegerType, strict = false).as("i")).df.collect()
    assert(lax(0).getInt(0) == 12 && lax(1).isNullAt(0))
    val prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      intercept[Exception] {
        TableFrame.fromDF(df)
          .select(td.col("s").cast(IntegerType, strict = true).as("i")).df.collect()
      }
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("integer arithmetic wraps without ANSI (Polars wrapping behavior)") {
    import spark.implicits._
    val df = Seq(Int.MaxValue).toDF("v")
    val r = df.select((F.col("v") + 1).as("w")).head()
    assert(r.getInt(0) == Int.MinValue)
  }

  test("maintain_order sort is stable for equal keys") {
    import spark.implicits._
    // many equal keys across partitions; payload records input order
    val df = spark.range(1000).select(
      (F.col("id") % 5).as("k"), F.col("id").as("payload"))
      .repartition(8)
    val sorted = TableFrame.fromDF(df.orderBy("payload")) // fix input order
      .sort(Seq("k"), maintainOrder = true).df.collect()
    val byKey = sorted.groupBy(_.getLong(0))
    byKey.foreach { case (k, rows) =>
      val payloads = rows.map(_.getLong(1)).toSeq
      assert(payloads == payloads.sorted, s"key $k not stable")
    }
  }

  test("timestamps round-trip through the store at microsecond precision (UTC)") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-06-30 23:59:59.123456")
    val df = Seq(ts).toDF("ts")
    val dir = java.nio.file.Files.createTempDirectory("graft-sem").toString
    df.write.parquet(s"$dir/t")
    val back = spark.read.parquet(s"$dir/t").head().getTimestamp(0)
    assert(back == ts) // micros preserved, no tz shift under UTC session
  }
}
