package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DtNs, Expr, StrNs, TableFrame}

/** API-coverage watchdog — the analog of the reference's import-time
  * surface diff (frame.py:2843-2890): asserts via reflection that the
  * wrapper exposes the full declared operator surface of SURVEY §2, so a
  * regression that drops a method fails loudly. */
class SurfaceSpec extends AnyFunSuite {
  private def methods(c: Class[_]): Set[String] =
    c.getMethods.map(_.getName).toSet

  test("Expr covers the §2.7 scalar surface") {
    val m = methods(classOf[Expr])
    val required = Set(
      "abs", "add", "alias", "and_", "arccos", "arccosh", "arcsin", "arcsinh",
      "arctan", "arctanh", "cast", "cbrt", "ceil", "clip", "cos", "cosh", "cot",
      "degrees", "eq", "eq_missing", "exp", "fill_nan", "fill_null", "filter",
      "first", "floor", "floordiv", "ge", "gt", "hash", "is_between",
      "is_finite", "is_in", "is_infinite", "is_nan", "is_not_nan",
      "is_not_null", "is_null", "is_unique", "last", "le", "log", "log1p",
      "log10", "lt", "mod", "mul", "ne", "ne_missing", "neg", "not_", "or_",
      "pow", "radians", "rank", "diff", "reinterpret", "round",
      "round_sig_figs", "sign", "sin", "sinh", "count", "len", "slice", "sqrt",
      "sub", "max", "min", "sum", "mean", "median", "n_unique", "tan", "tanh",
      "truediv", "xor", "str", "dt")
    val missing = required -- m
    assert(missing.isEmpty, s"Expr missing: $missing")
  }

  test("str namespace covers §2.7 string surface") {
    val m = methods(classOf[StrNs])
    val required = Set(
      "to_date", "to_datetime", "to_time", "len_bytes", "len_chars",
      "to_uppercase", "to_lowercase", "to_titlecase", "strip_chars",
      "strip_chars_start", "strip_chars_end", "strip_prefix", "strip_suffix",
      "pad_start", "pad_end", "zfill", "contains", "find", "ends_with",
      "starts_with", "extract", "count_matches", "replace", "replace_all",
      "reverse", "slice", "head", "tail", "to_integer", "contains_any",
      "replace_many", "grok")
    val missing = required -- m
    assert(missing.isEmpty, s"StrNs missing: $missing")
  }

  test("dt namespace covers §2.7 datetime surface") {
    val m = methods(classOf[DtNs])
    val required = Set(
      "add_business_days", "truncate", "combine", "to_string", "strftime",
      "millennium", "century", "year", "is_leap_year", "iso_year", "quarter",
      "month", "week", "weekday", "day", "ordinal_day", "time", "date",
      "datetime", "hour", "minute", "second", "millisecond", "microsecond",
      "nanosecond", "epoch", "timestamp", "convert_time_zone",
      "replace_time_zone", "total_days", "total_hours", "total_minutes",
      "total_seconds", "total_milliseconds", "total_microseconds",
      "total_nanoseconds", "offset_by", "month_start", "month_end",
      "base_utc_offset", "dst_offset")
    val missing = required -- m
    assert(missing.isEmpty, s"DtNs missing: $missing")
  }

  test("TableFrame covers the §2.2-2.6 frame surface") {
    val m = methods(classOf[TableFrame])
    val required = Set(
      "select", "with_columns", "drop", "rename", "filter", "unnest", "slice",
      "limit", "head", "tail", "first", "last", "first_row", "last_row",
      "item", "clear", "cast", "sort", "join", "group_by", "agg", "unique",
      "drop_nulls", "drop_nans", "fill_null", "fill_nan", "fill_null_strategy",
      "grok", "columns", "schema", "has_same_schema", "has_cols",
      "assert_has_cols", "shrink_dtype", "to_dict", "extract_rows",
      "dtypes", "width", "is_empty", "inspect", "toExport")
    val missing = required -- m
    assert(missing.isEmpty, s"TableFrame missing: $missing")
  }

  test("constructors and new frame ops work") {
    val spark = TestSession.spark
    val tf = TableFrame.fromDict(spark, Seq(
      "id" -> Seq(1, 2, 3), "name" -> Seq("a", "b", "c")))
    assert(tf.count() == 3)
    assert(tf.has_cols(Seq("id", "name")))
    assert(!tf.has_cols(Seq("nope")))
    val shrunk = tf.shrink_dtype()
    assert(shrunk.df.schema("id").dataType == org.apache.spark.sql.types.ByteType)
    val e = TableFrame.empty(spark, tf.userSchema)
    assert(e.count() == 0 && e.has_same_schema(tf))
    assert(tf.extract_rows(1, 1).head.get(0) == 2)
    assert(tf.width == 2 && !tf.is_empty && e.is_empty)
    assert(tf.dtypes == Seq(org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.StringType))
    assert(tf.inspect(1) eq tf) // passthrough returns the same frame
  }

  test("no gate or oracle key is silently shadowed by a duplicate") {
    import scala.jdk.CollectionConverters._
    // (a) cross-object shadowing: SparkEntry composes the maps with ++,
    // which silently keeps the LAST binding of a repeated key
    val qParts = Seq(
      graft.queries.RelationalQueries.queries,
      graft.queries.PipelineQueries.queries,
      graft.queries.ExtendedQueries.queries,
      graft.queries.ParityQueries.queries,
      graft.queries.ScaleQueries.queries,
      graft.queries.QualityQueries.queries,
      graft.queries.CurationQueries.queries,
      graft.queries.AnalyticsQueries.queries,
      graft.queries.ModelQueries.queries,
      graft.queries.TpchQueries.queries)
    assert(qParts.map(_.keySet).reduce(_ ++ _).size == qParts.map(_.size).sum,
      "a gate key is defined in two query objects (one silently shadowed)")
    val oParts = Seq(
      graft.queries.RelationalOracles.oracleSql,
      graft.queries.PipelineOracles.oracleSql,
      graft.queries.ExtendedOracles.oracleSql,
      graft.queries.ParityOracles.oracleSql,
      graft.queries.ScaleOracles.oracleSql,
      graft.queries.QualityOracles.oracleSql,
      graft.queries.CurationOracles.oracleSql,
      graft.queries.AnalyticsOracles.oracleSql,
      graft.queries.ModelOracles.oracleSql,
      graft.queries.TpchOracles.oracleSql)
    assert(oParts.map(_.keySet).reduce(_ ++ _).size == oParts.map(_.size).sum,
      "an oracle key is defined in two oracle objects (one silently shadowed)")
    // (b) within-literal duplicates are INVISIBLE at runtime (a Map
    // literal keeps the last duplicate with no error — this silently
    // killed the NFC-normalization gate for several rounds), so scan the
    // source for anchored key lines; loop-generated keys won't appear
    // here, so the scan is a no-duplicates check, not a completeness one
    val dir = java.nio.file.Paths.get("src/main/scala/graft/queries")
    assume(java.nio.file.Files.isDirectory(dir), s"no source at $dir")
    val keyLine = """^\s*"(q_\w+)" ->.*$""".r
    def dupKeysIn(suffix: String): Seq[String] =
      java.nio.file.Files.list(dir).iterator.asScala
        .filter(_.getFileName.toString.endsWith(suffix)).toSeq
        .flatMap(p => java.nio.file.Files.readAllLines(p).asScala.collect {
          case keyLine(k) => k
        })
        .groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dupKeysIn("Queries.scala").isEmpty,
      s"duplicate gate keys in source: ${dupKeysIn("Queries.scala")}")
    assert(dupKeysIn("Oracles.scala").isEmpty,
      s"duplicate oracle keys in source: ${dupKeysIn("Oracles.scala")}")
  }

  test("gate contract: every oracle has a gate; rows-only set is exactly the documented ops") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    // an oracle whose gate name drifted would silently vanish from the
    // driver's hash check — fail here instead
    assert((o -- q).isEmpty, s"oracles without a gate query: ${(o -- q).toSeq.sorted}")
    assert(q.size >= 321, s"gate count dropped to ${q.size}")
    // only the hash-seeded/probabilistic/centroid-routed ops may skip the
    // value-hash oracle; anything else appearing here is a coverage bug
    // (q_dedup_simhash and q_text_winnow left this set in r13: their
    // md5-prefix-seeded formulations carry full value-hash oracles)
    val rowsOnly = q -- o
    val justified = Set("q_ann_ivf", "q_ann_lsh", "q_ann_pq", "q_ann_ivfpq",
      // deflate has no SQL analog; CurationSpec pins known-ratio orderings
      "q_compression_ratio",
      "q_approx_nunique",
      "q_dedup_minhash", "q_dedup_semantic",
      "q_dedup_incremental_near",
      // data-dependent per-word merge loop, no SQL analog; PipelineSpec
      // holds the Sennrich differential + q_tokenize_bpe_exact twin
      "q_tokenize_bpe",
      // xxhash64-seeded signature estimates; StreamingSpec holds the
      // batch-band-index differential and the planted-rewrite assertions
      "q_stream_neardup",
      // binary DataSketches HLL estimates (same family as
      // q_approx_nunique); StreamingSpec holds the exact streamed==batch
      // per-hour differential + windows-union-to-corpus equality
      "q_stream_distinct")
    assert(rowsOnly == justified,
      s"unexpected rows-only gates: ${(rowsOnly -- justified).toSeq.sorted}; " +
        s"missing: ${(justified -- rowsOnly).toSeq.sorted}")
  }
}
