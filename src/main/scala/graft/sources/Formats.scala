package graft.sources

import org.apache.spark.sql.{Column, DataFrame, DataFrameReader, SparkSession, functions => F}

import graft.functions.ChronoFormat

/** Typed file-format configuration mirroring the reference's `FileFormat`
  * hierarchy (`client/td-sdk/tabsdata/_format.py`: CSVFormat :119,
  * NDJSONFormat :467, LogFormat :482, ParquetFormat :497, AvroFormat :70).
  * Each maps its named options onto Spark reader/writer options, so a
  * reference user's format config ports field-for-field.
  *
  * Mapping notes (CSVFormat):
  *   - separator/quote_char/eol_char/input_encoding/input_has_header/
  *     input_comment_prefix → Spark `sep`/`quote`/`lineSep`/`encoding`/
  *     `header`/`comment` directly
  *   - input_null_values: Spark's `nullValue` takes one string; the first
  *     value maps there and any further values are nulled post-read on
  *     string columns (inference runs after the primary null is applied)
  *   - input_ignore_errors → `mode=DROPMALFORMED`;
  *     input_truncate_ragged_lines → `mode=PERMISSIVE` (Spark pads/ignores
  *     ragged tails by default)
  *   - input_skip_rows: Spark has no skip option — emulated by slicing the
  *     file as text per file before parsing. Works per-file like the
  *     reference; documented as a small-file path (the slice runs on one
  *     executor per file, fine for header-junk skipping, wrong for
  *     gigabyte single files)
  *   - output_datetime_format/output_date_format: chrono (Rust) specifiers
  *     translated through [[ChronoFormat.toJava]] — the same translator
  *     the `str.strftime` surface uses
  *   - output_quote_style: necessary → Spark default; always → `quoteAll`;
  *     never → empty quote char. `non_numeric` is not expressible in
  *     Spark's CSV writer and raises.
  */
sealed trait FileFormatSpec {
  def formatName: String
  def readerOptions: Map[String, String] = Map.empty
  def writerOptions: Map[String, String] = Map.empty
  /** Post-read fixups that option maps can't express (extra null values). */
  def postRead(df: DataFrame): DataFrame = df
}

final case class CsvFormat(
    separator: String = ",",
    quoteChar: String = "\"",
    eolChar: String = "\n",
    inputEncoding: String = "UTF-8",
    inputNullValues: Seq[String] = Nil,
    inputCommentPrefix: Option[String] = None,
    inputHasHeader: Boolean = true,
    inputSkipRows: Int = 0,
    inputIgnoreErrors: Boolean = false,
    outputIncludeHeader: Boolean = true,
    outputDatetimeFormat: Option[String] = None,
    outputDateFormat: Option[String] = None,
    outputNullValue: Option[String] = None,
    outputQuoteStyle: String = "necessary") extends FileFormatSpec {
  override def formatName: String = "csv"

  override def readerOptions: Map[String, String] = {
    val base = Map(
      "sep" -> separator,
      "quote" -> quoteChar,
      "encoding" -> inputEncoding,
      "header" -> inputHasHeader.toString,
      "inferSchema" -> "true")
    val eol = if (eolChar == "\n") Map.empty
      else Map("lineSep" -> eolChar)
    val nulls = inputNullValues.headOption.map("nullValue" -> _).toMap
    val comment = inputCommentPrefix.map { p =>
      require(p.length == 1, s"Spark CSV comment prefix is a single char, got '$p'")
      "comment" -> p
    }.toMap
    val mode = if (inputIgnoreErrors) Map("mode" -> "DROPMALFORMED") else Map.empty
    base ++ eol ++ nulls ++ comment ++ mode
  }

  override def writerOptions: Map[String, String] = {
    val base = Map(
      "sep" -> separator,
      "header" -> outputIncludeHeader.toString)
    val dt = outputDatetimeFormat
      .map(f => "timestampFormat" -> ChronoFormat.toJava(f)).toMap
    val d = outputDateFormat
      .map(f => "dateFormat" -> ChronoFormat.toJava(f)).toMap
    val nv = outputNullValue.map("nullValue" -> _).toMap
    val quote = outputQuoteStyle match {
      case "necessary" => Map.empty[String, String]
      case "always"    => Map("quoteAll" -> "true")
      case "never"     => Map("quote" -> "")
      case other => throw new IllegalArgumentException(
        s"output_quote_style '$other' not expressible in Spark's CSV writer")
    }
    base ++ dt ++ d ++ nv ++ quote
  }

  /** Null out the 2nd..nth input_null_values on string columns, then
    * re-infer their types: Spark's schema inference only saw the primary
    * `nullValue`, so a column whose only non-numeric tokens were extra
    * null markers stays string-typed unless re-inferred (Polars applies
    * every null value before inference — `_format.py` input_null_values).
    * One aggregate pass decides castability for all columns at once. */
  override def postRead(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val extra = inputNullValues.drop(1)
    if (extra.isEmpty) return df
    val stringCols = df.schema.fields
      .filter(_.dataType == StringType).map(_.name)
    if (stringCols.isEmpty) return df
    val nulled = df.withColumns(stringCols.map { n =>
      n -> F.when(F.col(n).isin(extra: _*), F.lit(null)).otherwise(F.col(n))
    }.toMap)
    // castability counters: for each column × candidate type, how many
    // non-null values fail try_cast (0 → whole column casts cleanly)
    val candidates = Seq("BIGINT", "DOUBLE", "TIMESTAMP", "BOOLEAN")
    val aggs = stringCols.flatMap { n =>
      F.count(F.col(n)).as(s"n&$n") +:
        candidates.map { t =>
          F.count(F.when(F.col(n).isNotNull &&
            F.expr(s"try_cast(`$n` AS $t)").isNull, 1)).as(s"$t&$n")
        }
    }
    val stats = nulled.agg(aggs.head, aggs.tail: _*).head()
    nulled.withColumns(stringCols.flatMap { n =>
      val nonNull = stats.getAs[Long](s"n&$n")
      if (nonNull == 0) None // all-null column: keep string
      else candidates.find(t => stats.getAs[Long](s"$t&$n") == 0L)
        .map(t => n -> F.expr(s"try_cast(`$n` AS $t)"))
    }.toMap)
  }
}

final case class NdjsonFormat() extends FileFormatSpec {
  override def formatName: String = "ndjson"
}
final case class LogFormat() extends FileFormatSpec {
  override def formatName: String = "log"
}
final case class ParquetFormat() extends FileFormatSpec {
  override def formatName: String = "parquet"
}
final case class OrcFormat() extends FileFormatSpec {
  override def formatName: String = "orc"
}
/** `chunkSize` ports the reference's AvroFormat(chunk_size) (_format.py:75):
  * there it bounds rows per read/write batch; the Spark-native analog on
  * the write path is rows per output file (`maxRecordsPerFile`), which is
  * what bounds a downstream reader's batch memory the same way. Read-side
  * batching is Spark's own columnar batch sizing — no option to map. */
final case class AvroFormat(chunkSize: Int = 50000) extends FileFormatSpec {
  override def formatName: String = "avro"
  override def writerOptions: Map[String, String] =
    Map("maxRecordsPerFile" -> chunkSize.toString)
}

object FileFormatSpec {
  /** Read with a typed format spec: options + skip-rows emulation +
    * post-read fixups over the plain [[FileSource]] machinery. */
  def read(spark: SparkSession, pattern: String, fmt: FileFormatSpec): DataFrame =
    fmt match {
      case csv: CsvFormat if csv.inputSkipRows > 0 =>
        // per-file text slice, then parse the remaining lines as CSV.
        // Row order within a text file partition follows the file; the
        // window is per file so multi-file globs skip per file like the
        // reference transporter.
        import org.apache.spark.sql.expressions.Window
        val lines = spark.read.option("lineSep", csv.eolChar).text(pattern)
          .withColumn("__file", F.input_file_name())
          .withColumn("__pos", F.monotonically_increasing_id())
        val w = Window.partitionBy("__file").orderBy("__pos")
        val kept = lines.withColumn("__rn", F.row_number().over(w))
          .where(F.col("__rn") > csv.inputSkipRows)
          .orderBy("__pos")
          .select("value")
        import spark.implicits._
        val ds = kept.as[String]
        var r = spark.read
        csv.readerOptions.foreach { case (k, v) => r = r.option(k, v) }
        csv.postRead(r.csv(ds))
      case _ =>
        val src = FileSource(pattern, fmt.formatName, fmt.readerOptions)
        val frames = src.load(spark, Map.empty)
        // a typed-format read is an explicit single-table request: a
        // missing location is an error naming the path here, unlike the
        // flow-engine source path where it means a None input — and a
        // glob's per-file frames (FileSource list semantics) concatenate
        // back into the one table the caller asked for
        if (frames.isEmpty) throw new java.io.FileNotFoundException(
          s"no files match: $pattern")
        fmt.postRead(frames.reduce(_.unionByName(_)))
    }

  def write(df: DataFrame, path: String, fmt: FileFormatSpec,
      mode: String = "overwrite"): Unit =
    FileSink(path, fmt.formatName, mode, fmt.writerOptions).write(df)
}
