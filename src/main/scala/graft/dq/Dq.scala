package graft.dq

import org.apache.spark.sql.{Column, functions => F}

import graft.core.{Expr, TableFrame}

/** Data-quality namespace (reference: tableframe/dq/engine.py:22-310 —
  * `tf._dq`: null/nan/sign/membership/range checks materialized as boolean
  * result columns with a postfix). Thin library over Column predicates;
  * every check is codegen'd. */
object Dq {
  val DefaultPostfix = "_dq"

  final case class Check(name: String, predicate: Column => Column)

  def is_null: Check = Check("is_null", _.isNull)
  def is_not_null: Check = Check("is_not_null", _.isNotNull)
  def is_nan: Check = Check("is_nan", F.isnan(_))
  def is_not_nan: Check = Check("is_not_nan", c => !F.isnan(c))
  def is_null_or_nan: Check = Check("is_null_or_nan", c => c.isNull || F.isnan(c))
  def is_not_null_or_nan: Check = Check("is_not_null_or_nan", c => !(c.isNull || F.isnan(c)))
  def is_in(values: Seq[Any]): Check = Check("is_in", _.isin(values: _*))
  def is_not_in(values: Seq[Any]): Check = Check("is_not_in", c => !c.isin(values: _*))
  def is_positive: Check = Check("is_positive", _ > 0)
  def is_positive_or_zero: Check = Check("is_positive_or_zero", _ >= 0)
  def is_negative: Check = Check("is_negative", _ < 0)
  def is_negative_or_zero: Check = Check("is_negative_or_zero", _ <= 0)
  def is_zero: Check = Check("is_zero", _ === 0)
  def is_between(lo: Any, hi: Any): Check =
    Check("is_between", c => c >= F.lit(lo) && c <= F.lit(hi))
  def is_not_between(lo: Any, hi: Any): Check =
    Check("is_not_between", c => !(c >= F.lit(lo) && c <= F.lit(hi)))
  /** Arbitrary predicate check (reference: dq/engine.py `expr`/`fn`). */
  def expr(name: String, e: Expr): Check = Check(name, _ => e.col)

  /** Apply checks to a column, appending `<col>_<check><postfix>` boolean
    * columns. */
  def apply(tf: TableFrame, column: String, checks: Seq[Check],
      postfix: String = DefaultPostfix): TableFrame = {
    val named = checks.map(ch =>
      s"$column${if (ch.name.isEmpty) "" else "_" + ch.name}$postfix" ->
        Expr(ch.predicate(F.col(s"`$column`"))))
    tf.with_columns(named: _*)
  }

  /** Row-level validity: AND of all checks on their columns → one column. */
  def validate(tf: TableFrame, columnChecks: Seq[(String, Check)],
      as: String = "dq_valid"): TableFrame = {
    val combined = columnChecks
      .map { case (c, ch) => ch.predicate(F.col(s"`$c`")) }
      .reduce(_ && _)
    tf.with_columns(as -> Expr(combined))
  }

  /** Referential-integrity check: how many non-NULL child foreign keys
    * have no matching parent row — the cross-TABLE complement of the
    * column checks above. One left join against the DISTINCT parent
    * keys (AQE broadcasts dimension-sized parents) + one aggregation;
    * NULL child keys are excluded (a null FK is a nullness finding, not
    * an orphan). Output one row: (fk, n_rows, n_orphans, orphan_frac).
    * Union several calls for a whole-schema report. */
  def fkOrphans(child: org.apache.spark.sql.DataFrame, childCol: String,
      parent: org.apache.spark.sql.DataFrame, parentCol: String,
      name: String): org.apache.spark.sql.DataFrame = {
    val keys = parent.where(F.col(parentCol).isNotNull)
      .select(F.col(parentCol).as("td_k")).distinct()
      .withColumn("td_hit", F.lit(1))
    child.where(F.col(childCol).isNotNull)
      .select(F.col(childCol).as("td_k"))
      .join(keys, Seq("td_k"), "left")
      .agg(F.count(F.lit(1)).as("n_rows"),
        F.sum(F.when(F.col("td_hit").isNull, 1L).otherwise(0L))
          .cast("long").as("n_orphans"))
      .select(F.lit(name).as("fk"), F.col("n_rows"), F.col("n_orphans"),
        F.when(F.col("n_rows") > 0L,
          F.col("n_orphans").cast("double") / F.col("n_rows").cast("double"))
          .as("orphan_frac"))
  }

  /** Benford first-digit profile of a positive numeric column — the
    * fabricated-data / unit-mixing screen (Benford 1938; Newcomb 1881):
    * naturally-occurring amounts spread across orders of magnitude put
    * digit d first with probability log10(1 + 1/d); synthetic or
    * truncated columns don't. One row-local digit projection (the
    * magnitude via the libm [[graft.expressions.MathKernels]] ln/exp
    * pair, so both engines state the IDENTICAL doubles — a boundary
    * value like 1000 may land a digit off libm-exactly the same way on
    * both sides, and the result is clamped to [1, 9]), one 9-key count
    * shuffle, a broadcast total. Rows with NULL or non-positive values
    * are excluded. Output per digit 1..9: (digit, n, frac, expected)
    * ascending — compare frac against expected (or feed a chi-squared)
    * downstream. */
  def benford(df: org.apache.spark.sql.DataFrame, col: String)
      : org.apache.spark.sql.DataFrame = {
    import graft.expressions.MathKernels
    val spark = df.sparkSession
    import spark.implicits._
    val x = F.col(col).cast("double")
    val pos = df.where(x.isNotNull && x > 0.0d).select(x.as("td_x"))
    val ln10 = MathKernels.ln(F.lit(10.0d))
    val mag = F.floor(MathKernels.ln(F.col("td_x")) / ln10)
    val digit = F.least(F.greatest(
      F.floor(F.col("td_x") / MathKernels.exp(mag.cast("double") * ln10))
        .cast("long"),
      F.lit(1L)), F.lit(9L))
    val counts = pos.select(digit.as("digit"))
      .groupBy(F.col("digit")).agg(F.count(F.lit(1)).as("n"))
    // total via an unpartitioned window over the ≤9-row counts relation
    // (the Lorenz convention) — a separate broadcast aggregate would
    // re-execute the corpus scan + digit shuffle a second time
    val wTot = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val grid = (1L to 9L).toDF("digit")
    grid.join(counts, Seq("digit"), "left")
      .withColumn("td_tot",
        F.sum(F.coalesce(F.col("n"), F.lit(0L))).over(wTot).cast("long"))
      .select(F.col("digit"),
        F.coalesce(F.col("n"), F.lit(0L)).as("n"),
        // no positive values → NULL fractions (not 0/0 = NaN): the
        // degenerate answer the pre-window formulation gave
        F.when(F.col("td_tot") > 0L,
          F.coalesce(F.col("n"), F.lit(0L)).cast("double") /
            F.col("td_tot").cast("double")).as("frac"),
        (MathKernels.ln(F.lit(1.0d) +
          (F.lit(1.0d) / F.col("digit").cast("double"))) / ln10)
          .as("expected"))
      .orderBy(F.col("digit").asc)
  }
}
