package graft.core

import org.apache.spark.sql.types._

/** Dtype surface of the engine.
  *
  * The reference exposes a flat (non-nested) set of column types
  * (reference: client/td-sdk/tabsdata/tableframe/dtypes.py:13-37; nested types
  * explicitly excluded at dtypes.py:52-60). This object maps each of them onto
  * a Spark SQL type, following the lossless-widening rules documented in
  * SURVEY.md §1.3 (unsigned ints widen; UInt64 → Decimal(20,0); Int128 →
  * Decimal(38,0) bounded).
  */
object Dtypes {
  val Boolean: DataType = BooleanType
  val Int8: DataType    = ByteType
  val Int16: DataType   = ShortType
  val Int32: DataType   = IntegerType
  val Int64: DataType   = LongType
  /** Unsigned widenings — Spark has no unsigned integral types. */
  val UInt8: DataType  = ShortType
  val UInt16: DataType = IntegerType
  val UInt32: DataType = LongType
  val UInt64: DataType = DecimalType(20, 0)
  /** Int128: Polars' range slightly exceeds Decimal(38,0); documented bounded. */
  val Int128: DataType  = DecimalType(38, 0)
  val Float32: DataType = FloatType
  val Float64: DataType = DoubleType
  def Decimal(precision: Int, scale: Int): DataType = DecimalType(precision, scale)
  val String: DataType = StringType
  val Utf8: DataType   = StringType
  val Date: DataType   = DateType
  /** Datetime(us, tz): Spark TimestampType is µs-precision with session TZ. */
  val Datetime: DataType = TimestampType
  /** Polars Time (ns-of-day) has no Spark scalar type; convention: Long ns-of-day. */
  val Time: DataType     = LongType
  val Duration: DataType = DayTimeIntervalType()
  /** Categorical/Enum are semantic no-ops over String (dictionary encoding is a
    * Parquet concern, handled transparently by the Parquet writer). */
  val Categorical: DataType = StringType
  val Enum: DataType        = StringType
  val Null: DataType        = NullType

  /** Name → dtype, for a string-driven API mirroring the reference's dtype names. */
  def byName(name: String): DataType = name.toLowerCase match {
    case "boolean" | "bool"      => BooleanType
    case "int8"                  => ByteType
    case "int16"                 => ShortType
    case "int32" | "int"         => IntegerType
    case "int64" | "long"        => LongType
    case "uint8"                 => UInt8
    case "uint16"                => UInt16
    case "uint32"                => UInt32
    case "uint64"                => UInt64
    case "int128"                => Int128
    case "float32" | "float"     => FloatType
    case "float64" | "double"    => DoubleType
    case "string" | "utf8"       => StringType
    case "date"                  => DateType
    case "datetime" | "timestamp" => TimestampType
    case "time"                  => Time
    case "duration"              => Duration
    case "categorical" | "enum"  => StringType
    case "null"                  => NullType
    case other                   => throw new IllegalArgumentException(s"unknown dtype: $other")
  }

  /** Least common supertype for concat(how="*_relaxed") — mirrors Polars'
    * relaxed vertical/diagonal concat type unification (SURVEY §2.6). */
  private val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
  private val fractional: Set[DataType] = Set(FloatType, DoubleType)
  def superType(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y            => x
    case (NullType, y)               => y
    case (x, NullType)               => x
    case (x, y) if integral(x) && integral(y) =>
      if (x.defaultSize >= y.defaultSize) x else y
    case (x, y) if integral(x) && fractional(y) => y
    case (x, y) if fractional(x) && integral(y) => x
    case (FloatType, DoubleType) | (DoubleType, FloatType) => DoubleType
    case (d: DecimalType, y) if integral(y)  => d
    case (x, d: DecimalType) if integral(x)  => d
    case (_: DecimalType, DoubleType) | (DoubleType, _: DecimalType) => DoubleType
    case (a: DecimalType, b: DecimalType) =>
      DecimalType(math.max(a.precision - a.scale, b.precision - b.scale) + math.max(a.scale, b.scale),
        math.max(a.scale, b.scale))
    case (DateType, TimestampType) | (TimestampType, DateType) => TimestampType
    case (StringType, _) | (_, StringType) => StringType
    case _ => StringType // last-resort common representation
  }
}
