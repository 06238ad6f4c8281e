package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources._

/** Typed file-format specs mapped onto Spark options (reference
  * `_format.py` CSVFormat option surface). */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def writeFile(content: String, name: String = "data.csv"): String = {
    val dir = Files.createTempDirectory("graft-fmt").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/$name"), content)
    s"$dir/$name"
  }

  test("typed-format read of a missing location errors naming the path") {
    val e = intercept[java.io.FileNotFoundException] {
      FileFormatSpec.read(spark, "/no/such/dir/*.ndjson", NdjsonFormat())
    }
    assert(e.getMessage.contains("/no/such/dir"))
  }

  test("csv: separator, quote, comment prefix, multiple null values") {
    val p = writeFile(
      """#generated file
        |id;name;score
        |1;alpha;10.5
        |2;'semi;colon';N/A
        |3;NULL;7.0
        |#trailing comment
        |""".stripMargin)
    val fmt = CsvFormat(separator = ";", quoteChar = "'",
      inputCommentPrefix = Some("#"),
      inputNullValues = Seq("NULL", "N/A"))
    val df = FileFormatSpec.read(spark, p, fmt)
    val rows = df.collect().sortBy(_.getInt(0))
    assert(rows.length == 3)
    assert(rows(1).getString(1) == "semi;colon") // quoted separator preserved
    assert(rows(1).isNullAt(2))                  // N/A → null (2nd null value)
    assert(rows(2).isNullAt(1))                  // NULL → null (primary)
    assert(rows(2).getDouble(2) == 7.0)
  }

  test("csv: skip_rows drops leading junk before the header") {
    val p = writeFile(
      """garbage preamble line
        |more garbage
        |k,v
        |1,a
        |2,b
        |""".stripMargin)
    val df = FileFormatSpec.read(spark, p, CsvFormat(inputSkipRows = 2))
    assert(df.columns.toSeq == Seq("k", "v"))
    assert(df.count() == 2)
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("csv: ignore_errors drops malformed rows") {
    val p = writeFile(
      """a,b
        |1,x
        |not_an_int,y
        |3,z
        |""".stripMargin)
    // with a strict schema, the bad row drops instead of failing the read
    val opts = CsvFormat(inputIgnoreErrors = true).readerOptions - "inferSchema"
    var r = spark.read.schema("a INT, b STRING")
    opts.foreach { case (k, v) => r = r.option(k, v) }
    val rows = r.csv(p).collect()
    assert(rows.map(x => (x.isNullAt(0), x.getString(1))).count(!_._1) >= 2)
    assert(rows.length <= 3)
  }

  test("csv writer: chrono datetime format, quote always, null value") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-fmt-out").toString
    val df = Seq(
      (1, Some("x,y"), java.sql.Timestamp.valueOf("2024-03-05 10:20:30")),
      (2, None, java.sql.Timestamp.valueOf("2024-03-06 11:21:31")))
      .toDF("id", "s", "ts")
    val fmt = CsvFormat(
      outputDatetimeFormat = Some("%Y/%m/%d %H.%M.%S"), // chrono specifiers
      outputNullValue = Some("\\N"),
      outputQuoteStyle = "always")
    FileFormatSpec.write(df, s"$out/t", fmt)
    val lines = spark.read.text(s"$out/t").collect().map(_.getString(0)).sorted
    assert(lines.exists(_.contains("\"2024/03/05 10.20.30\"")), lines.mkString("|"))
    assert(lines.exists(_.contains("\\N")), lines.mkString("|"))
    // quoteAll: every field quoted
    assert(lines.forall(_.startsWith("\"")), lines.mkString("|"))
  }

  test("round-trip: typed csv out → typed csv in preserves data") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-fmt-rt").toString
    val df = Seq((1, "a|b", 2.5), (2, "plain", 3.5)).toDF("id", "txt", "v")
    FileFormatSpec.write(df, s"$out/t", CsvFormat(separator = "|"))
    val back = FileFormatSpec.read(spark, s"$out/t/*.csv", CsvFormat(separator = "|"))
    assert(back.count() == 2)
    assert(back.collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1).toSeq == Seq((1, "a|b", 2.5), (2, "plain", 3.5)))
  }
}
