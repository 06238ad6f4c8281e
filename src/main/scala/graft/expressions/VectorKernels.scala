package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** Fused float/double vector kernels (dot, cosine, squared L2) as one
  * codegen'd expression each.
  *
  * Replaces the `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, _+_)`
  * higher-order-function chains in the similarity/ANN operators: lambda
  * bodies evaluate interpreted — no whole-stage codegen, boxed Doubles, a
  * fresh intermediate array per pair — which is exactly the trap measured on
  * [[WordShingles]] (~20×). Here each kernel is a single primitive loop over
  * the two ArrayData buffers inside generated code, so an ANN pass stays in
  * one WholeStageCodegen span.
  *
  * Semantics match the HOF formulation bit-for-bit (hash-parity with the
  * DuckDB oracle depends on it): elements are widened to double, accumulated
  * sequentially left-to-right, and a length mismatch or null element yields
  * NULL (zip_with pads with nulls → null propagates through the fold).
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** op tag: 0 = dot, 1 = cosine, 2 = squared L2 distance. */
  protected def op: Int

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  @inline private def getD(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case _         => arr.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val ta = elemType(left); val tb = elemType(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = getD(a, i, ta); val y = getD(b, i, tb)
      op match {
        case 0 => dot += x * y
        case 1 => dot += x * y; na += x * x; nb += y * y
        case _ => { val d = x - y; dot += d * d }
      }
      i += 1
    }
    op match {
      case 1 => dot / (math.sqrt(na) * math.sqrt(nb))
      case _ => dot
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getB = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y"); val d = ctx.freshName("d")
      val accum = op match {
        case 0 => s"$dot += $x * $y;"
        case 1 => s"$dot += $x * $y; $na += $x * $x; $nb += $y * $y;"
        case _ => s"double $d = $x - $y; $dot += $d * $d;"
      }
      val finish = op match {
        case 1 => s"${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));"
        case _ => s"${ev.value} = $dot;"
      }
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = (double) $a.$getA($i);
         |    final double $y = (double) $b.$getB($i);
         |    $accum
         |  }
         |  if (!${ev.isNull}) { $finish }
         |}
       """.stripMargin
    })
  }
}

case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override protected def op: Int = 0
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

case class CosineSim(left: Expression, right: Expression) extends VectorFold {
  override protected def op: Int = 1
  override def prettyName: String = "vec_cosine"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

case class SqDist(left: Expression, right: Expression) extends VectorFold {
  override protected def op: Int = 2
  override def prettyName: String = "vec_sqdist"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDist =
    copy(left = l, right = r)
}

object VectorKernels {
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
  def sqdist(a: Column, b: Column): Column =
    Bridge.column(SqDist(Bridge.expression(a), Bridge.expression(b)))
}
