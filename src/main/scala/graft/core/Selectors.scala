package graft.core

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Column selectors (reference: tableframe/selectors.py — ~30 matchers, all
  * excluding system columns). Pure driver-side resolution against the frame's
  * schema → `Seq[Expr]`; no Catalyst involvement (SURVEY §2.2). */
object Selectors {
  /** A selector is a predicate over schema fields, resolved per-frame. */
  final case class Selector(matches: StructField => Boolean) {
    def resolve(tf: TableFrame): Seq[Expr] =
      tf.userSchema.fields.toSeq.filter(matches)
        .map(f => Expr(F.col(s"`${f.name}`")))
    def |(o: Selector): Selector = Selector(f => matches(f) || o.matches(f))
    def &(o: Selector): Selector = Selector(f => matches(f) && o.matches(f))
    def unary_! : Selector = Selector(f => !matches(f))
  }

  val all: Selector = Selector(_ => true)
  def by_name(names: String*): Selector = Selector(f => names.contains(f.name))
  def contains(sub: String): Selector = Selector(_.name.contains(sub))
  def starts_with(p: String): Selector = Selector(_.name.startsWith(p))
  def ends_with(s: String): Selector = Selector(_.name.endsWith(s))
  def matches(regex: String): Selector = { val r = regex.r; Selector(f => r.findFirstIn(f.name).isDefined) }
  val alpha: Selector = Selector(_.name.forall(_.isLetter))
  val alphanumeric: Selector = Selector(_.name.forall(_.isLetterOrDigit))
  val digit: Selector = Selector(_.name.forall(_.isDigit))
  def by_dtype(ts: DataType*): Selector = Selector(f => ts.contains(f.dataType))
  val integer: Selector = Selector(f =>
    Set[DataType](ByteType, ShortType, IntegerType, LongType).contains(f.dataType))
  val signed_integer: Selector = integer
  val unsigned_integer: Selector = Selector(f =>
    f.dataType == Dtypes.UInt64) // unsigned widenings are indistinguishable post-map
  val float: Selector = Selector(f => f.dataType == FloatType || f.dataType == DoubleType)
  val numeric: Selector = Selector(_.dataType.isInstanceOf[NumericType])
  val decimal: Selector = Selector(_.dataType.isInstanceOf[DecimalType])
  val boolean: Selector = Selector(_.dataType == BooleanType)
  val string: Selector = Selector(_.dataType == StringType)
  val categorical: Selector = string
  val date: Selector = Selector(_.dataType == DateType)
  val datetime: Selector = Selector(_.dataType == TimestampType)
  val duration: Selector = Selector(_.dataType.isInstanceOf[DayTimeIntervalType])
  val temporal: Selector = Selector(f =>
    f.dataType == DateType || f.dataType == TimestampType ||
      f.dataType.isInstanceOf[DayTimeIntervalType])
  val binary: Selector = Selector(_.dataType == BinaryType)
  def exclude(names: String*): Selector = Selector(f => !names.contains(f.name))
  /** first/last/by_index need frame column order — resolved lazily. */
  def first(tf: TableFrame): Seq[Expr] = tf.columns("user").take(1).map(n => Expr(F.col(s"`$n`")))
  def last(tf: TableFrame): Seq[Expr] = tf.columns("user").takeRight(1).map(n => Expr(F.col(s"`$n`")))
  def by_index(tf: TableFrame, idx: Int*): Seq[Expr] = {
    val user = tf.columns("user")
    idx.map(i => Expr(F.col(s"`${user(if (i < 0) user.length + i else i)}`")))
  }
}
