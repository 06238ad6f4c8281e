package graft

import java.nio.file.Files

import org.apache.spark.sql.{Row, functions => F}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{AvroFiles, AvroFormat, FileFormatSpec, FileSink, FileSource}

/** Avro container-file round-trips over the avro-mapred Hadoop formats
  * (reference semantics: file_inputs.py:1277-1332, file_outputs.py:1864-1905). */
class AvroSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def tmp(): String =
    Files.createTempDirectory("graft-avro").toString + "/out"

  test("avro round-trip: atomics, date/timestamp/decimal logical types, nulls") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = false),
      StructField("small", IntegerType, nullable = true),
      StructField("d", DateType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("amt", DecimalType(12, 2), nullable = true),
      StructField("blob", BinaryType, nullable = true)))
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, 7,
        java.sql.Date.valueOf("2024-03-01"),
        java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789"),
        new java.math.BigDecimal("12345.67"), Array[Byte](1, 2, 3)),
      Row(2L, null, null, false, null, null, null, null, null),
      Row(3L, "gamma", -0.25, true, -1,
        java.sql.Date.valueOf("1969-12-31"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.0"),
        new java.math.BigDecimal("-0.01"), Array[Byte]()))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val path = tmp()
    AvroFiles.write(df, path)
    val back = AvroFiles.read(spark, path)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.orderBy("id").collect()
    val want = df.orderBy("id").collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      (0 until schema.length).foreach { i =>
        (g.get(i), w.get(i)) match {
          case (a: Array[Byte], b: Array[Byte]) => assert(a.sameElements(b), schema(i).name)
          case (a: java.math.BigDecimal, b: java.math.BigDecimal) =>
            assert(a.compareTo(b) == 0, schema(i).name)
          case (a, b) => assert(a == b, schema(i).name)
        }
      }
    }
  }

  test("avro round-trip: nested struct, array, map") {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("tags", ArrayType(StringType, containsNull = true), nullable = true),
      StructField("props", MapType(StringType, LongType, valueContainsNull = true), nullable = true),
      StructField("nest", StructType(Seq(
        StructField("a", StringType, nullable = true),
        StructField("b", DoubleType, nullable = false))), nullable = true)))
    val rows = Seq(
      Row(1, Seq("x", null, "z"), Map("k1" -> 10L, "k2" -> null), Row("in", 2.5)),
      Row(2, null, null, null),
      Row(3, Seq.empty[String], Map.empty[String, Long], Row(null, 0.0)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val path = tmp()
    AvroFiles.write(df, path)
    val back = AvroFiles.read(spark, path).orderBy("id").collect()
    assert(back(0).getSeq[String](1) == Seq("x", null, "z"))
    assert(back(0).getMap[String, Any](2).toMap == Map("k1" -> 10L, "k2" -> null))
    assert(back(0).getStruct(3) == Row("in", 2.5))
    assert(back(1).isNullAt(1) && back(1).isNullAt(2) && back(1).isNullAt(3))
    assert(back(2).getSeq[String](1).isEmpty)
    assert(back(2).getStruct(3) == Row(null, 0.0))
  }

  test("avro through FileSource/FileSink, glob pattern read") {
    val df = spark.range(100).select(
      F.col("id"), (F.col("id") % 7).cast("string").as("bucket"))
    val path = tmp()
    FileSink(path, format = "avro").write(df.toDF())
    val viaGlob = FileSource(path + "/part-*", format = "avro")
      .load(spark, Map.empty).reduce(_.union(_)) // one frame per part file
    assert(viaGlob.count() == 100)
    assert(viaGlob.agg(F.sum("id")).head().getLong(0) == 4950L)
    // overwrite mode replaces prior contents
    FileSink(path, format = "avro").write(df.limit(10).toDF())
    val again = FileSource(path, format = "avro").load(spark, Map.empty).head
    assert(again.count() == 10)
  }

  test("avro write parallelism follows input partitions") {
    val df = spark.range(0, 1000, 1, 8).toDF()
    val path = tmp()
    AvroFiles.write(df, path)
    val parts = new java.io.File(path).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".avro"))
    assert(parts == 8)
  }

  test("avro chunked write rolls files at maxRecordsPerFile, round-trips") {
    import spark.implicits._
    val df = (1 to 5).map(i => (i.toLong, s"r$i")).toDF("id", "v").coalesce(1)
    val path = tmp()
    // 5 rows / cap 2 → 3 container files from the single partition
    AvroFiles.write(df, path, maxRecordsPerFile = 2L)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".avro")).map(_.getName).sorted
    assert(files.length == 3, files.toSeq)
    val back = AvroFiles.read(spark, path)
    assert(back.count() == 5)
    assert(back.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 5L))
    // the typed format spec carries the reference default (50000) through
    // the sink option surface
    assert(AvroFormat().writerOptions("maxRecordsPerFile") == "50000")
    val viaSink = tmp()
    FileFormatSpec.write(df, viaSink, AvroFormat(chunkSize = 2))
    assert(new java.io.File(viaSink).listFiles()
      .count(_.getName.endsWith(".avro")) == 3)
  }

  test("failed chunked write leaves no readable partial .avro files") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    val boom = F.udf((i: Int) =>
      if (i >= 1) throw new RuntimeException("synthetic write failure") else i)
    val df = (1 to 5).toDF("id").coalesce(1).withColumn("id", boom($"id"))
    val path = tmp()
    intercept[org.apache.spark.SparkException] {
      AvroFiles.write(df, path, maxRecordsPerFile = 2L)
    }
    val left = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
    // chunk temp was cleaned up, nothing was renamed into a readable name
    assert(!left.exists(_.getName.endsWith(".avro")), left.toSeq)
    assert(!left.exists(_.getName.endsWith(".tmp")), left.toSeq)
  }
}
