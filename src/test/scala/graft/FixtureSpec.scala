package graft

import org.apache.spark.sql.{Row, functions => F}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Expr, TableFrame}
import graft.udf.Udf

/** Differential/golden tests over the reference's own fixture shapes
  * (FIXTURES.md F1-F4, mirroring
  * tests_tabsdata/test_tableframe/test_tableframe_integration.py:36-120). */
class FixtureSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  /** F1: the 11-column operator-parity frame (one replica; the reference
    * self-concats 2^13× purely for volume). */
  def f1: TableFrame = {
    val schema = StructType(Seq(
      StructField("u", LongType), StructField("i", LongType),
      StructField("f", DoubleType), StructField("ff", DoubleType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("ss", StringType), StructField("d", StringType),
      StructField("dt", StringType), StructField("t", StringType),
      StructField("si", StringType)))
    val rows = Seq(
      Row(0L, -3L, 0.5, Double.PositiveInfinity, true, "  Abc ", "A", "2024-01-01", "2024-01-01 10:00:00Z", "10:00:00", "42"),
      Row(1L, 2L, -1.5, Double.NaN, false, "xyz", "B", "2024-02-29", "2024-02-29 23:59:59Z", "23:59:59", "007"),
      Row(2L, 0L, 2.25, 1.0, true, "MiXeD", "C", "2023-12-31", "2023-12-31 00:00:01Z", "00:00:01", "-5"),
      Row(3L, null, null, -0.0, null, null, "D", null, null, "12:30:45", null),
      Row(4L, 7L, 3.5, 2.5, false, "zz", "F", "2022-06-15", "2022-06-15 06:30:00Z", "06:30:00", "123"),
      Row(null, 5L, 1.0, null, true, "Abc", "A", "2024-01-01", "2024-01-01 10:00:00Z", "10:00:00", "42"),
      Row(6L, -8L, -2.5, 0.0, false, "QQQ", "B", "2021-01-31", "2021-01-31 12:00:00Z", "12:00:00", "9"),
      Row(7L, 1L, 0.0, 3.75, true, "abc", "C", "2020-02-29", "2020-02-29 08:15:30Z", "08:15:30", "0"),
      Row(8L, 9L, 4.25, Double.NaN, null, "  pad", "D", "2019-11-11", "2019-11-11 11:11:11Z", "11:11:11", "77"),
      Row(9L, -1L, -0.25, 1.5, false, "end ", "F", "2018-07-04", "2018-07-04 18:00:00Z", "18:00:00", "100"),
      Row(5L, 4L, 2.0, 2.0, true, "dup", "A", "2024-01-01", "2024-01-01 10:00:00Z", "10:00:00", "42"))
    TableFrame.fromDF(spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema))
  }

  test("F1: null vs NaN are distinct through the op surface") {
    val r = f1.with_columns(
      "ff_null" -> td.col("ff").is_null,
      "ff_nan" -> td.col("ff").is_nan,
      "ff_finite" -> td.col("ff").is_finite)
      .selectCols("u", "ff_null", "ff_nan", "ff_finite")
      .sort(Seq("u"), nullsLast = true).collectRows()
    // u=1 → NaN: not null, is nan; u=3 → -0.0 finite; row with u null → ff null
    val byU = r.map(x => Option(x.get(0)) -> (x.get(1), x.get(2), x.get(3))).toMap
    assert(byU(Some(1L)) == (false, true, false))
    assert(byU(Some(3L)) == (false, false, true))
    assert(byU(None) == (true, false, null)) // Spark isnan(null)=false; finite→null
    // drop_nans on ff keeps nulls, drops the 2 NaNs; drop_nulls drops only
    // the single null and KEEPS NaN (Polars semantics — na.drop would not)
    assert(f1.drop_nans(Seq("ff")).count() == 9)
    assert(f1.drop_nulls(Seq("ff")).count() == 10)
  }

  test("F1: string-encoded temporals cast through str namespace") {
    val r = f1.filter(td.col("d").is_not_null)
      .select(
        td.col("u"),
        td.col("d").str.to_date("%Y-%m-%d").as("d2"),
        td.col("dt").str.to_datetime("%Y-%m-%d %H:%M:%SZ").as("dt2"),
        td.col("t").str.to_time().as("t_ns"),
        td.col("si").str.to_integer().as("si_int"))
    assert(r.df.schema("d2").dataType == DateType)
    assert(r.df.schema("dt2").dataType == TimestampType)
    val row = r.filter(td.col("u") === 1).df.head()
    assert(row.getDate(1).toString == "2024-02-29")
    assert(row.getTimestamp(2).toString.startsWith("2024-02-29 23:59:59"))
    assert(row.getLong(3) == (23L * 3600 + 59 * 60 + 59) * 1000000000L)
    assert(row.getLong(4) == 7L)
    // leap-year day parses in 2020/2024, and to_integer handles signs
    val si = r.df.collect().map(r0 => Option(r0.get(4)))
    assert(si.contains(Some(-5L)))
  }

  test("F1: group_by on low-cardinality key with null group") {
    val g = f1.group_by("ss")
      .agg(td.lit(1).len.as("n"), td.col("f").sum.as("f_sum"))
      .sort(Seq("ss"), nullsLast = true)
    val rows = g.collectRows()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B", "C", "D", "F"))
    assert(rows.map(_.getLong(1)).sum == 11)
  }

  test("F1: eq vs eq_missing on nulls; unique keep=none on dup rows") {
    val r = f1.with_columns(
      "eq" -> (td.col("u") === 5L),
      "eqm" -> td.col("u").eq_missing(td.lit(null)))
      .filter(td.col("u").is_null)
      .selectCols("eq", "eqm").df.head()
    assert(r.isNullAt(0)) // null = 5 → null
    assert(r.getBoolean(1)) // null <=> null → true
    val dups = f1.unique(Seq("ss"), keep = "none")
    assert(dups.count() == 0) // every ss value appears ≥2 times
  }

  test("F2: struct unnest in place") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, Row("Alice", 30L), "active"),
        Row(2L, Row("Bob", null), "inactive"))),
      StructType(Seq(
        StructField("id", LongType),
        StructField("info", StructType(Seq(
          StructField("name", StringType), StructField("age", LongType)))),
        StructField("status", StringType))))
    val tf = TableFrame.fromDF(df).unnest("info")
    assert(tf.columns("user") == Seq("id", "name", "age", "status"))
    val rows = tf.sort(Seq("id")).collectRows()
    assert(rows(0).getString(1) == "Alice" && rows(0).getLong(2) == 30L)
    assert(rows(1).getString(1) == "Bob" && rows(1).isNullAt(2))
  }

  test("F3: Sum and Ratio UDFs") {
    import spark.implicits._
    val tf = TableFrame.fromDF(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("a", "b"))
    class SumUdf extends Udf(Seq("total" -> LongType)) {
      override def onElement(v: Seq[Any]): Seq[Any] =
        Seq(v(0).asInstanceOf[Long] + v(1).asInstanceOf[Long])
    }
    val out = Udf(tf, Seq(F.col("a"), F.col("b")), new SumUdf)
      .sort(Seq("a")).collectRows()
    assert(out.map(_.getAs[Long]("total")).toSeq == Seq(11L, 22L, 33L))
    class RatioUdf extends Udf(Seq("ratio" -> DoubleType)) {
      override def onBatch(rows: Iterator[Seq[Any]]): Iterator[Seq[Any]] =
        rows.map(v => Seq(v(0).asInstanceOf[Long].toDouble / v(1).asInstanceOf[Long]))
    }
    val out2 = Udf(tf, Seq(F.col("a"), F.col("b")), new RatioUdf)
      .sort(Seq("a")).collectRows()
    assert(out2.map(_.getAs[Double]("ratio")).toSeq == Seq(0.1, 0.1, 0.1))
    intercept[IllegalArgumentException] {
      new Udf(Seq("$td.bad" -> LongType)) {}
    }
  }

  test("F4: golden publisher output with $td.id masked") {
    val dir = java.nio.file.Files.createTempDirectory("graft-golden")
    java.nio.file.Files.writeString(dir.resolve("invoices.csv"),
      "Duration,Pulse,Maxpulse,Calories\n60,110,130,409.1\n60,117,145,479.0\n45,109,175,282.4\n")
    val src = graft.sources.FileSource(s"$dir/*.csv", "csv")
    val tfs = graft.sources.Sources.loadRaw(src, spark)
    val tf = tfs.head
    // golden compare: user columns exact, $td.id masked, $td.ver.* structural
    val rows = tf.sort(Seq("Pulse")).collectRows().map { r =>
      tf.df.columns.zipWithIndex.map {
        case (c, i) if c == "$td.id" => c -> "<dummy_id>"
        case (c, i) => c -> r.get(i)
      }.toMap
    }
    assert(rows.length == 3)
    assert(rows.head("Duration") == 45 && rows.head("Calories") == 282.4)
    assert(rows.forall(_("$td.id") == "<dummy_id>"))
    assert(rows.map(_.apply("$td.ver.execution")).distinct.length == 1)
    val realIds = tf.df.select(F.col("`$td.id`")).collect().map(_.getString(0))
    assert(realIds.distinct.length == 3 && realIds.forall(_.length == 26))
  }
}
