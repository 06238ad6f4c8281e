package graft.core

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.functions.ChronoFormat

/** Expression wrapper over [[org.apache.spark.sql.Column]].
  *
  * Mirrors the reference's `Expr` surface (a thin wrapper over `pl.Expr`,
  * reference: client/td-sdk/tabsdata/tableframe/expr/expr.py:43-52; per-method
  * citations in SURVEY.md §2.7). Every method delegates to a codegen'd Spark
  * built-in from `org.apache.spark.sql.functions` — no UDFs in this file — so
  * expressions stay inside whole-stage codegen on the 100 TB path.
  */
final case class Expr(col: Column) {
  private def wrap(c: Column): Expr = Expr(c)
  private def c(other: Any): Column = other match {
    case e: Expr   => e.col
    case cc: Column => cc
    case v          => F.lit(v)
  }

  // ---- operator dunders (expr.py:63-176) ----
  def +(o: Any): Expr = wrap(col + c(o))
  def -(o: Any): Expr = wrap(col - c(o))
  def *(o: Any): Expr = wrap(col * c(o))
  def /(o: Any): Expr = wrap(col / c(o))
  def %(o: Any): Expr = wrap(col % c(o))
  def unary_- : Expr  = wrap(-col)
  def unary_! : Expr  = wrap(!col)
  def ===(o: Any): Expr = wrap(col === c(o))
  def =!=(o: Any): Expr = wrap(col =!= c(o))
  def <(o: Any): Expr  = wrap(col < c(o))
  def <=(o: Any): Expr = wrap(col <= c(o))
  def >(o: Any): Expr  = wrap(col > c(o))
  def >=(o: Any): Expr = wrap(col >= c(o))
  def &&(o: Any): Expr = wrap(col && c(o))
  def ||(o: Any): Expr = wrap(col || c(o))

  // ---- named math / logic / comparison (expr.py:188-2705) ----
  def abs: Expr = wrap(F.abs(col))
  def add(o: Any): Expr = this + o
  def alias(name: String): Expr = wrap(col.as(name))
  def as(name: String): Expr = alias(name)
  def and_(o: Any): Expr = this && o
  def arccos: Expr = wrap(F.acos(col))
  def arccosh: Expr = wrap(F.acosh(col))
  def arcsin: Expr = wrap(F.asin(col))
  def arcsinh: Expr = wrap(F.asinh(col))
  def arctan: Expr = wrap(F.atan(col))
  def arctanh: Expr = wrap(F.atanh(col))
  /** strict=false → try_cast (null on error, Polars non-strict). strict=true
    * → plain cast, which raises only under `spark.sql.ansi.enabled`; without
    * ANSI it nulls invalid values — enable ANSI per-session for Polars'
    * raising strict-cast behavior (expr.py:474). */
  def cast(t: DataType, strict: Boolean = false): Expr =
    if (strict) wrap(col.cast(t)) else wrap(col.try_cast(t))
  def cast(name: String): Expr = cast(Dtypes.byName(name))
  def cbrt: Expr = wrap(F.cbrt(col))
  def ceil: Expr = wrap(F.ceil(col))
  def clip(lower: Any = null, upper: Any = null): Expr = {
    var r = col
    if (lower != null) r = F.greatest(r, c(lower))
    if (upper != null) r = F.least(r, c(upper))
    wrap(r)
  }
  def cos: Expr = wrap(F.cos(col))
  def cosh: Expr = wrap(F.cosh(col))
  def cot: Expr = wrap(F.cot(col))
  def degrees: Expr = wrap(F.degrees(col))
  def eq(o: Any): Expr = this === o
  /** null==null matches (expr.py:776) → Spark null-safe equality. */
  def eq_missing(o: Any): Expr = wrap(col <=> c(o))
  def exp: Expr = wrap(F.exp(col))
  def fill_nan(v: Any): Expr = wrap(F.when(F.isnan(col), c(v)).otherwise(col))
  def fill_null(v: Any): Expr = wrap(F.coalesce(col, c(v)))
  /** Conditional aggregation input (expr.py:913). */
  def filter(pred: Expr): Expr = wrap(F.when(pred.col, col))
  def first: Expr = wrap(F.first(col, ignoreNulls = false))
  def floor: Expr = wrap(F.floor(col))
  def floordiv(o: Any): Expr = wrap(F.floor(col / c(o)).cast(LongType))
  def ge(o: Any): Expr = this >= o
  def gt(o: Any): Expr = this > o
  def hash(seed: Int = 42): Expr = wrap(F.xxhash64(F.lit(seed), col))
  def is_between(lower: Any, upper: Any, closed: String = "both"): Expr = closed match {
    case "both"  => wrap(col >= c(lower) && col <= c(upper))
    case "left"  => wrap(col >= c(lower) && col < c(upper))
    case "right" => wrap(col > c(lower) && col <= c(upper))
    case "none"  => wrap(col > c(lower) && col < c(upper))
  }
  def is_finite: Expr = wrap(!F.isnan(col) && col =!= Double.PositiveInfinity && col =!= Double.NegativeInfinity)
  def is_in(values: Seq[Any]): Expr = wrap(col.isin(values: _*))
  def is_infinite: Expr = wrap(col === Double.PositiveInfinity || col === Double.NegativeInfinity)
  def is_nan: Expr = wrap(F.isnan(col))
  def is_not_nan: Expr = wrap(!F.isnan(col))
  def is_not_null: Expr = wrap(col.isNotNull)
  def is_null: Expr = wrap(col.isNull)
  /** Per-row uniqueness flag (expr.py:1372) — window count over own value. */
  def is_unique: Expr = wrap(F.count(F.lit(1)).over(Window.partitionBy(col)) === 1)
  def last: Expr = wrap(F.last(col, ignoreNulls = false))
  def le(o: Any): Expr = this <= o
  def log(base: Double = math.E): Expr =
    if (base == math.E) wrap(F.log(col)) else wrap(F.log(base, col))
  def log1p: Expr = wrap(F.log1p(col))
  def log10: Expr = wrap(F.log10(col))
  def lt(o: Any): Expr = this < o
  def mod(o: Any): Expr = this % o
  def mul(o: Any): Expr = this * o
  def ne(o: Any): Expr = this =!= o
  def ne_missing(o: Any): Expr = wrap(!(col <=> c(o)))
  def neg: Expr = wrap(-col)
  def not_ : Expr = wrap(!col)
  def or_(o: Any): Expr = this || o
  def pow(o: Any): Expr = wrap(F.pow(col, c(o)))
  def radians: Expr = wrap(F.radians(col))
  /** Whole-column rank (expr.py:1843); methods average/min/max/dense/ordinal
    * (typing.py:86). NOTE: unpartitioned window — single-reducer at scale; for
    * 100 TB-scale ranking use TableFrame.withRank (sort-based). */
  def rank(method: String = "average", descending: Boolean = false,
      seed: Long = 0L): Expr = {
    val w = Window.orderBy(if (descending) col.desc else col.asc)
    method match {
      case "min"     => wrap(F.rank().over(w))
      case "dense"   => wrap(F.dense_rank().over(w))
      case "ordinal" => wrap(F.row_number().over(w))
      case "max"     => // min rank + (ties - 1)
        wrap(F.rank().over(w) + F.count(F.lit(1)).over(Window.partitionBy(col)) - 1)
      case "average" =>
        wrap((F.rank().over(w) * 2 + F.count(F.lit(1)).over(Window.partitionBy(col)) - 1)
          .cast(DoubleType) / 2)
      case "random"  => // ties broken by a seeded per-row draw (typing.py:86)
        wrap(F.row_number().over(
          Window.orderBy(if (descending) col.desc else col.asc, F.rand(seed))))
      case other => throw new IllegalArgumentException(s"rank method: $other")
    }
  }
  /** Element minus n-previous in frame order (expr.py:1884). Frame order in
    * Spark = the hidden ordinal attached by TableFrame.withOrdinal. */
  def diff(n: Int = 1, orderBy: Expr): Expr =
    wrap(col - F.lag(col, n).over(Window.orderBy(orderBy.col)))
  /** Int64 bits ↔ unsigned reinterpret (expr.py:1926). Spark has no unsigned:
    * signed=false maps the bit pattern onto Decimal(20,0). */
  def reinterpret(signed: Boolean): Expr =
    if (signed) wrap(col.cast(LongType))
    else wrap(F.when(col < 0, col.cast(DecimalType(20, 0)) + F.lit(BigDecimal(2).pow(64).bigDecimal))
      .otherwise(col.cast(DecimalType(20, 0))))
  def round(decimals: Int = 0): Expr = wrap(F.round(col, decimals))
  /** round to significant figures (expr.py:1993). Spark's round() requires a
    * foldable scale, so this scales by a power of ten instead:
    * e = floor(log10(|x|)) - (digits-1); round(x/10^e) * 10^e. */
  def round_sig_figs(digits: Int): Expr = {
    val e = F.floor(F.log10(F.abs(col))) - (digits - 1)
    val p = F.pow(F.lit(10.0), e)
    wrap(F.when(col === 0, col).otherwise(F.round(col / p) * p))
  }
  def sign: Expr = wrap(F.signum(col))
  def sin: Expr = wrap(F.sin(col))
  def sinh: Expr = wrap(F.sinh(col))
  def count: Expr = wrap(F.count(col))
  def len: Expr = wrap(F.count(F.lit(1)))
  def slice(offset: Int, length: Int): Expr = wrap(F.slice(col, offset + 1, length))
  def sqrt: Expr = wrap(F.sqrt(col))
  def sub(o: Any): Expr = this - o
  def max: Expr = wrap(F.max(col))
  def min: Expr = wrap(F.min(col))
  def sum: Expr = wrap(F.sum(col))
  def mean: Expr = wrap(F.avg(col))
  def median: Expr = wrap(F.median(col))
  def n_unique: Expr = wrap(F.countDistinct(col))
  def tan: Expr = wrap(F.tan(col))
  def tanh: Expr = wrap(F.tanh(col))
  def truediv(o: Any): Expr = this / o
  def xor(o: Any): Expr = wrap((col && !c(o)) || (!col && c(o)))

  /** String namespace (`Expr.str`, string.py). */
  def str: StrNs = new StrNs(col)
  /** Datetime namespace (`Expr.dt`, datetime.py). */
  def dt: DtNs = new DtNs(col)
}

/** `Expr.str` — string functions (reference: tableframe/expr/string.py). */
final class StrNs(private val col: Column) {
  private def wrap(c: Column): Expr = Expr(c)

  def to_date(format: String = null): Expr =
    if (format == null) wrap(F.to_date(col))
    else wrap(F.to_date(col, ChronoFormat.toJava(format)))
  def to_datetime(format: String = null): Expr =
    if (format == null) wrap(F.to_timestamp(col))
    else wrap(F.to_timestamp(col, ChronoFormat.toJava(format)))
  /** Time convention: Long nanoseconds-of-day (Dtypes.Time). */
  def to_time(format: String = "%H:%M:%S"): Expr = {
    val ts = F.to_timestamp(col, ChronoFormat.toJava(format))
    wrap(((F.hour(ts) * 3600L + F.minute(ts) * 60L + F.second(ts)) * 1000000000L))
  }
  def len_bytes: Expr = wrap(F.octet_length(col))
  def len_chars: Expr = wrap(F.char_length(col))
  def to_uppercase: Expr = wrap(F.upper(col))
  def to_lowercase: Expr = wrap(F.lower(col))
  /** ≈ initcap; boundary semantics differ on non-space separators (SURVEY §2.7). */
  def to_titlecase: Expr = wrap(F.initcap(col))
  def strip_chars(chars: String = null): Expr =
    if (chars == null) wrap(F.trim(col)) else wrap(F.trim(col, chars))
  def strip_chars_start(chars: String = null): Expr =
    if (chars == null) wrap(F.ltrim(col)) else wrap(F.ltrim(col, chars))
  def strip_chars_end(chars: String = null): Expr =
    if (chars == null) wrap(F.rtrim(col)) else wrap(F.rtrim(col, chars))
  def strip_prefix(prefix: String): Expr =
    wrap(F.when(col.startsWith(prefix), col.substr(F.lit(prefix.length + 1), F.length(col)))
      .otherwise(col))
  def strip_suffix(suffix: String): Expr =
    wrap(F.when(col.endsWith(suffix), col.substr(F.lit(1), F.length(col) - suffix.length))
      .otherwise(col))
  def pad_start(n: Int, fill: String = " "): Expr = wrap(F.lpad(col, n, fill))
  def pad_end(n: Int, fill: String = " "): Expr = wrap(F.rpad(col, n, fill))
  /** Zero-pad respecting sign (string.py:519). */
  def zfill(n: Int): Expr =
    wrap(F.when(F.length(col) >= n, col)
      .when(col.startsWith("-"),
        F.concat(F.lit("-"), F.lpad(col.substr(F.lit(2), F.length(col)), n - 1, "0")))
      .otherwise(F.lpad(col, n, "0")))
  def contains(pattern: String, literal: Boolean = false): Expr =
    if (literal) wrap(col.contains(pattern)) else wrap(F.regexp_like(col, F.lit(pattern)))
  /** 0-based index of first match, null if absent (string.py:592). */
  def find(pattern: String, literal: Boolean = false): Expr = {
    val pos = if (literal) F.locate(pattern, col) else F.regexp_instr(col, F.lit(pattern))
    wrap(F.when(pos > 0, pos - 1))
  }
  def ends_with(suffix: String): Expr = wrap(col.endsWith(suffix))
  def starts_with(prefix: String): Expr = wrap(col.startsWith(prefix))
  /** Regex group extract; null on no-match (Polars) vs "" (Spark) → nullif. */
  def extract(pattern: String, group: Int = 1): Expr =
    wrap(F.nullif(F.regexp_extract(col, pattern, group), F.lit("")))
  def count_matches(pattern: String, literal: Boolean = false): Expr = {
    val p = if (literal) java.util.regex.Pattern.quote(pattern) else pattern
    wrap(F.regexp_count(col, F.lit(p)))
  }
  /** Replace the FIRST match only (Polars replace semantics). The `^(.*?)`
    * anchor confines regexp_replace to a single leftmost match — without the
    * anchor it would re-match after each replacement and hit every one. */
  def replace(pattern: String, value: String, literal: Boolean = false): Expr =
    if (literal) {
      val p = java.util.regex.Pattern.quote(pattern)
      val v = java.util.regex.Matcher.quoteReplacement(value)
      wrap(F.regexp_replace(col, "(?s)^(.*?)" + p, "$1" + v))
    } else wrap(F.regexp_replace(col, "(?s)^(.*?)" + pattern, "$1" + value))
  def replace_all(pattern: String, value: String, literal: Boolean = false): Expr =
    if (literal) wrap(F.replace(col, F.lit(pattern), F.lit(value)))
    else wrap(F.regexp_replace(col, pattern, value))
  def reverse: Expr = wrap(F.reverse(col))
  /** 0-based substring with negative-offset-from-end (string.py:898). */
  def slice(offset: Int, length: Int = Int.MaxValue): Expr = {
    val start = if (offset >= 0) F.lit(offset + 1)
      else F.greatest(F.length(col) + offset + 1, F.lit(1))
    val realLen = if (offset >= 0 || length == Int.MaxValue) F.lit(length)
      else F.least(F.lit(length), F.length(col) + offset + F.lit(length)) // clamp at string start
    wrap(col.substr(start, realLen))
  }
  def head(n: Int): Expr = wrap(col.substr(1, n))
  def tail(n: Int): Expr =
    wrap(F.when(F.length(col) <= n, col).otherwise(col.substr(-n, n)))
  def to_integer(base: Int = 10): Expr =
    if (base == 10) Expr(col).cast(LongType)
    else wrap(F.conv(col, base, 10).try_cast(LongType))
  /** Aho-Corasick any-of-patterns (string.py:1037) — OR of contains. */
  def contains_any(patterns: Seq[String]): Expr =
    wrap(patterns.map(p => col.contains(p)).reduce(_ || _))
  /** Multi-pattern literal replace (string.py:1076) — chained replace. */
  def replace_many(patterns: Seq[String], replacements: Seq[String]): Expr = {
    val pairs =
      if (replacements.length == 1) patterns.map(_ -> replacements.head)
      else patterns.zip(replacements)
    wrap(pairs.foldLeft(col) { case (acc, (p, r)) => F.replace(acc, F.lit(p), F.lit(r)) })
  }
  def grok(pattern: String): Expr = graft.functions.GrokFunctions.grokExpr(col, pattern)
}

/** `Expr.dt` — datetime functions (reference: tableframe/functions/datetime.py). */
final class DtNs(private val col: Column) {
  private def wrap(c: Column): Expr = Expr(c)
  private def timeOfDay: Column = col - F.date_trunc("DAY", col)

  def truncate(every: String): Expr = wrap(F.date_trunc(DtNs.truncUnit(every), col))
  def to_string(format: String): Expr = strftime(format)
  def strftime(format: String): Expr = wrap(F.date_format(col, ChronoFormat.toJava(format)))
  def millennium: Expr = wrap(F.ceil(F.year(col).cast(DoubleType) / 1000).cast(IntegerType))
  def century: Expr = wrap(F.ceil(F.year(col).cast(DoubleType) / 100).cast(IntegerType))
  def year: Expr = wrap(F.year(col))
  def is_leap_year: Expr = {
    val y = F.year(col)
    wrap((y % 4 === 0 && y % 100 =!= 0) || y % 400 === 0)
  }
  def iso_year: Expr = wrap(F.date_part(F.lit("YEAROFWEEK"), col).cast(IntegerType))
  def quarter: Expr = wrap(F.quarter(col))
  def month: Expr = wrap(F.month(col))
  def week: Expr = wrap(F.weekofyear(col))
  /** ISO weekday 1=Mon..7=Sun (Polars) from Spark 1=Sun..7=Sat. */
  def weekday: Expr = wrap(((F.dayofweek(col) + 5) % 7) + 1)
  def day: Expr = wrap(F.dayofmonth(col))
  def ordinal_day: Expr = wrap(F.dayofyear(col))
  /** Time-of-day as Long ns-of-day (Dtypes.Time convention). */
  def time: Expr =
    wrap((F.hour(col) * 3600L + F.minute(col) * 60L + F.second(col)) * 1000000000L +
      (F.unix_micros(col.cast(TimestampType)) % 1000000L) * 1000L)
  def date: Expr = wrap(F.to_date(col))
  def datetime: Expr = wrap(col.cast(TimestampType))
  def hour: Expr = wrap(F.hour(col))
  def minute: Expr = wrap(F.minute(col))
  def second(fractional: Boolean = false): Expr =
    if (!fractional) wrap(F.second(col))
    else wrap(F.second(col) + (F.unix_micros(col.cast(TimestampType)) % 1000000L).cast(DoubleType) / 1e6)
  def millisecond: Expr = wrap(((F.unix_micros(col.cast(TimestampType)) % 1000000L) / 1000L).cast(IntegerType))
  def microsecond: Expr = wrap((F.unix_micros(col.cast(TimestampType)) % 1000000L).cast(IntegerType))
  def nanosecond: Expr = wrap(((F.unix_micros(col.cast(TimestampType)) % 1000000L) * 1000L).cast(IntegerType))
  /** Epoch in a unit: s (default), ms, us, d. */
  def epoch(unit: String = "us"): Expr = unit match {
    case "s"  => wrap(F.unix_timestamp(col))
    case "ms" => wrap(F.unix_millis(col.cast(TimestampType)))
    case "us" => wrap(F.unix_micros(col.cast(TimestampType)))
    case "d"  => wrap(F.datediff(F.to_date(col), F.lit(java.sql.Date.valueOf("1970-01-01"))))
  }
  def timestamp: Expr = epoch("us")
  def convert_time_zone(tz: String): Expr =
    wrap(F.convert_timezone(F.lit("UTC"), F.lit(tz), col))
  /** Keep wall-clock, change instant: treat local wall time as being in tz. */
  def replace_time_zone(tz: String): Expr = wrap(F.to_utc_timestamp(col, tz))
  def total_days: Expr = totalSeconds.map(s => Expr((s / 86400).cast(LongType))).get
  def total_hours: Expr = totalSeconds.map(s => Expr((s / 3600).cast(LongType))).get
  def total_minutes: Expr = totalSeconds.map(s => Expr((s / 60).cast(LongType))).get
  def total_seconds: Expr = totalSeconds.map(s => Expr(s.cast(LongType))).get
  def total_milliseconds: Expr = totalSeconds.map(s => Expr((s * 1e3).cast(LongType))).get
  def total_microseconds: Expr = totalSeconds.map(s => Expr((s * 1e6).cast(LongType))).get
  def total_nanoseconds: Expr = totalSeconds.map(s => Expr((s * 1e9).cast(LongType))).get
  private def totalSeconds: Option[Column] = {
    // components of a day-time interval → total seconds (double)
    val d = F.date_part(F.lit("DAY"), col)
    val h = F.date_part(F.lit("HOUR"), col)
    val m = F.date_part(F.lit("MINUTE"), col)
    val s = F.date_part(F.lit("SECOND"), col)
    Some(((d * 24 + h) * 60 + m) * 60 + s)
  }
  /** Shift by a Polars duration string, e.g. "3d", "-2mo", "1y", "4h". */
  def offset_by(by: String): Expr = {
    val (n, unit) = DtNs.parseDuration(by)
    unit match {
      case "y"  => wrap(F.add_months(col, n * 12))
      case "q"  => wrap(F.add_months(col, n * 3))
      case "mo" => wrap(F.add_months(col, n))
      case "w"  => wrap(F.date_add(col, n * 7))
      case "d"  => wrap(F.date_add(col, n))
      case "h"  => wrap(F.timestamp_add("HOUR", F.lit(n), col.cast(TimestampType)))
      case "m"  => wrap(F.timestamp_add("MINUTE", F.lit(n), col.cast(TimestampType)))
      case "s"  => wrap(F.timestamp_add("SECOND", F.lit(n), col.cast(TimestampType)))
      case "ms" => wrap(F.timestamp_add("MILLISECOND", F.lit(n), col.cast(TimestampType)))
      case "us" => wrap(F.timestamp_add("MICROSECOND", F.lit(n), col.cast(TimestampType)))
    }
  }
  /** First instant of the month, preserving time-of-day (datetime.py:244). */
  def month_start: Expr = wrap(F.date_trunc("MONTH", col) + timeOfDay)
  /** Last day of the month, preserving time-of-day (datetime.py:248). */
  def month_end: Expr = wrap(F.last_day(col).cast(TimestampType) + timeOfDay)
  /** Business-day shift skipping Sat/Sun (datetime.py:22). */
  def add_business_days(n: Int): Expr = Expr(graft.functions.BusinessDays.add(col, n))
  def base_utc_offset(tz: String): Expr = Expr(graft.functions.TzFunctions.baseUtcOffsetSeconds(col, tz))
  def dst_offset(tz: String): Expr = Expr(graft.functions.TzFunctions.dstOffsetSeconds(col, tz))
  /** Combine a Date with a Time (ns-of-day long) → timestamp (datetime.py:73). */
  def combine(time: Expr): Expr =
    wrap(F.timestamp_add("SECOND", (time.col / 1000000000L).cast(LongType),
      col.cast(DateType).cast(TimestampType)))
  /** Replace individual datetime components (datetime.py:46). Unset args
    * keep the input's component; args may be Int literals or Exprs. Always
    * yields a timestamp — `.date` it back for Date columns. */
  def replace(year: Any = null, month: Any = null, day: Any = null,
      hour: Any = null, minute: Any = null, second: Any = null,
      microsecond: Any = null): Expr = {
    def part(over: Any, cur: Column): Column = over match {
      case null    => cur
      case e: Expr => e.col
      case v       => F.lit(v)
    }
    val ts = col.cast(TimestampType)
    val secs = (part(second, F.second(ts)).cast(DecimalType(16, 6)) +
      part(microsecond, F.unix_micros(ts) % 1000000L).cast(DecimalType(16, 6)) / 1000000L)
    wrap(F.make_timestamp(
      part(year, F.year(ts)), part(month, F.month(ts)), part(day, F.dayofmonth(ts)),
      part(hour, F.hour(ts)), part(minute, F.minute(ts)), secs))
  }
  /** Reinterpret the stored count in a new unit — changes the instant
    * (datetime.py:180). Spark stores micros; `ms` means "this micros count
    * was actually millis", etc. */
  def with_time_unit(unit: String): Expr = {
    val us = F.unix_micros(col.cast(TimestampType))
    unit match {
      case "us" => wrap(col.cast(TimestampType))
      case "ms" => wrap(F.timestamp_micros(us * 1000L))
      case "ns" => wrap(F.timestamp_micros((us / 1000L).cast(LongType)))
      case other => throw new IllegalArgumentException(s"time unit: $other")
    }
  }
  /** Convert the representation unit, preserving the instant (datetime.py:
    * 184). Spark holds a single micros representation, so `ms` truncates
    * sub-millisecond precision and `us`/`ns` are identity (ns precision is
    * not representable in TimestampType). */
  def cast_time_unit(unit: String): Expr = unit match {
    case "ms"        => wrap(F.date_trunc("MILLISECOND", col.cast(TimestampType)))
    case "us" | "ns" => wrap(col.cast(TimestampType))
    case other       => throw new IllegalArgumentException(s"time unit: $other")
  }
}

object DtNs {
  private[core] def truncUnit(every: String): String = every match {
    case "1y" | "y" | "year"      => "YEAR"
    case "1q" | "q" | "quarter"   => "QUARTER"
    case "1mo" | "mo" | "month"   => "MONTH"
    case "1w" | "w" | "week"      => "WEEK"
    case "1d" | "d" | "day"       => "DAY"
    case "1h" | "h" | "hour"      => "HOUR"
    case "1m" | "m" | "minute"    => "MINUTE"
    case "1s" | "s" | "second"    => "SECOND"
    case other                    => other.toUpperCase
  }
  private[core] def parseDuration(s: String): (Int, String) = {
    val m = "^(-?\\d+)(y|q|mo|w|d|h|m|s|ms|us)$".r
    s match {
      case m(n, u) => (n.toInt, u)
      case other   => throw new IllegalArgumentException(s"duration: $other")
    }
  }
}
