package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** Natural log via `java.lang.Math.log` (the HotSpot dlog intrinsic).
  *
  * Spark's own `log` codegens to `java.lang.StrictMath.log` (fdlibm), which
  * disagrees with the platform libm by 1 ulp on some arguments — measured
  * concretely on the BM25 idf argument 1 + 106.5/394.5, where
  * StrictMath.log is one ulp below Math.log == glibc log == DuckDB `ln`.
  * Operators whose oracle parity depends on log therefore use this kernel:
  * Math.log is intrinsified to the same result the system libm produces
  * (verified in RecallSpec/PipelineSpec gates), keeping scores
  * hash-comparable across engines. Interpreted eval takes the same
  * Math.log path, so JIT state cannot change a result.
  *
  * CAVEAT (r15, measured): the intrinsic is NOT glibc-identical on every
  * argument — at x = 0.5639405471386516 the warmed Math.log intrinsic
  * answers 1 ulp ABOVE glibc/DuckDB ln (found by the q_stream_jsd_monitor
  * gate; every prior ln-gated argument had agreed). Operators whose
  * oracle parity sums raw ln outputs must either tolerate the last ulp
  * or state one fixed-point rounding on both sides (the jsd family
  * reports at 2^20 for this reason). */
case class LibmLn(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "libm_ln"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a double argument, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Math.log(input.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.log($c)")

  override protected def withNewChildInternal(c: Expression): LibmLn =
    copy(child = c)
}

/** e^x via `java.lang.Math.exp` (the HotSpot dexp intrinsic) — the
  * inverse kernel of [[LibmLn]], with the same rationale: Spark's `exp`
  * codegens to StrictMath.exp (fdlibm), which can sit 1 ulp off the
  * platform libm that DuckDB's `exp` rides; the log-scaled quantile
  * sketch decodes grid indices through exp, so its oracle parity needs
  * the libm-consistent kernel. */
case class LibmExp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "libm_exp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a double argument, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Math.exp(input.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.exp($c)")

  override protected def withNewChildInternal(c: Expression): LibmExp =
    copy(child = c)
}

object MathKernels {
  /** Natural log matching the platform libm (see [[LibmLn]]). */
  def ln(c: Column): Column = Bridge.column(LibmLn(Bridge.expression(c)))
  /** e^x matching the platform libm (see [[LibmExp]]). */
  def exp(c: Column): Column = Bridge.column(LibmExp(Bridge.expression(c)))
}
