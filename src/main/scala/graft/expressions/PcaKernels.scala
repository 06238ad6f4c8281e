package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** Compact kernels for the fixed-point linear-algebra operators (PCA power
  * iteration, and any op built on per-dimension fixed-point sums).
  *
  * Why these exist (r17 optimization round): the original formulation
  * stated one `sum(cast(floor(...) as decimal(38,0)))` aggregate column and
  * one inline literal per dimension — ~2,500 expression nodes per
  * power-iteration pass. Execution was fine (0.11 s at sf0.1); ANALYZER/
  * OPTIMIZER time on the tree was ~0.3 s per pass and is paid afresh every
  * iteration because the iterate literals change. These kernels collapse
  * the plan to a handful of nodes (vectors ride as task reference objects)
  * without changing ANY produced double or decimal:
  *
  *   - [[CenteredDotVec]]: w = Σ_i (x_i − m_i)·v_i, ascending i, seed 0.0 —
  *     the exact fold `Pca.centeredDot` stated inline;
  *   - [[DeflateVec]]: xd_i = ((x_i − m_i) − p_1·w_1i) − p_2·w_2i …, the
  *     left-to-right prior deflation of `Pca.fitDeflatedK`;
  *   - [[VecScale]] / [[VecMul]]: elementwise arr_i·s / a_i·b_i;
  *   - [[FixedVecSumAgg]]: per-dimension Σ_rows floor(t_i·scale + 0.5) as
  *     EXACT integers (long fast path, BigInteger on overflow), emitted as
  *     decimal(38,0) — value-identical to the per-column
  *     `sum(cast(floor(t·scale + 0.5) as decimal(38,0)))` it replaces,
  *     including NULL for dimensions that saw no non-null input.
  */
abstract class VecUnaryKernel extends UnaryExpression {
  override def nullable: Boolean = true
  protected def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double> input, got $t")
    }
  @inline protected final def elemD(a: ArrayData, i: Int): Double =
    if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** Σ_i (x_i − means_i)·v_i with pinned ascending association (seed 0.0).
  * NULL on null input, short array, or any null element — exactly the
  * inline fold's null propagation. */
case class CenteredDotVec(child: Expression, means: Array[Double],
    v: Array[Double]) extends VecUnaryKernel {
  require(means.length == v.length)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "centered_dot"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() < means.length) return null
    var acc = 0.0
    var i = 0
    while (i < means.length) {
      if (a.isNullAt(i)) return null
      acc += (elemD(a, i) - means(i)) * v(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("cdMeans", means, "double[]")
    val w = ctx.addReferenceObj("cdV", v, "double[]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      s"""
         |if ($a.numElements() < $m.length) { ${ev.isNull} = true; } else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $m.length; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (((double) $a.$get($i)) - $m[$i]) * $w[$i];
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CenteredDotVec =
    copy(child = newChild)
}

/** Residual after centering and left-to-right prior deflation:
  * xd_i = ((x_i − means_i) − ps(0)·ws(0)(i)) − ps(1)·ws(1)(i) − …
  * `left` is the vector, `right` the array of prior projections (one per
  * `ws` entry; may be empty). Per-element NULL when that element is null;
  * every element NULL when the input or any projection is null. */
case class DeflateVec(left: Expression, right: Expression,
    means: Array[Double], ws: Seq[Array[Double]]) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "deflate_vec"

  private def elemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val lOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val rOk = right.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (lOk && rOk) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float|double>, array<double>), got " +
        s"${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val ps = r.asInstanceOf[ArrayData]
    val dim = means.length
    if (a.numElements() < dim || ps.numElements() != ws.length) return null
    var j = 0
    while (j < ws.length) {
      if (ps.isNullAt(j)) return null
      j += 1
    }
    val out = new Array[Any](dim)
    var i = 0
    while (i < dim) {
      if (!a.isNullAt(i)) {
        var acc = (if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i)) - means(i)
        var l2 = 0
        while (l2 < ws.length) {
          acc -= ps.getDouble(l2) * ws(l2)(i)
          l2 += 1
        }
        out(i) = acc
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("dfMeans", means, "double[]")
    val wsRef = ctx.addReferenceObj("dfWs", ws.map(_.clone()).toArray, "double[][]")
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val nw = ws.length
    nullSafeCodeGen(ctx, ev, (a, ps) => {
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val l2 = ctx.freshName("l"); val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      s"""
         |if ($a.numElements() < $m.length || $ps.numElements() != $nw) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $j = 0; $j < $nw; $j++) {
         |    if ($ps.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  }
         |  if (!${ev.isNull}) {
         |    Object[] $out = new Object[$m.length];
         |    for (int $i = 0; $i < $m.length; $i++) {
         |      if (!$a.isNullAt($i)) {
         |        double $acc = ((double) $a.$get($i)) - $m[$i];
         |        for (int $l2 = 0; $l2 < $nw; $l2++) {
         |          $acc -= $ps.getDouble($l2) * $wsRef[$l2][$i];
         |        }
         |        $out[$i] = (Double) $acc;
         |      }
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DeflateVec =
    copy(left = l, right = r)
}

/** arr_i · s elementwise; per-element NULL propagates, NULL scale nulls
  * the whole array. */
case class VecScale(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_scale"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, double), got $l / $r")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val s = r.asInstanceOf[Double]
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) out(i) = a.getDouble(i) * s
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = $a.numElements();
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) { $out[$i] = (Double) ($a.getDouble($i) * $s); }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecScale =
    copy(left = l, right = r)
}

/** a_i · b_i elementwise (use with a = b for the square); NULL element on
  * either side nulls that element; length mismatch nulls the result. */
case class VecMul(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_mul"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, array<double>), got $l / $r")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) out(i) = a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  Object[] $out = new Object[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |      $out[$i] = (Double) ($a.getDouble($i) * $b.getDouble($i));
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecMul =
    copy(left = l, right = r)
}

/** Exact-integer accumulator for one dimension: long fast path, BigInteger
  * spill on overflow. Addition is commutative-exact, so partitioning and
  * merge order cannot change the total — the same property the decimal
  * sums it replaces rely on. */
final class FixedAcc extends Serializable {
  var seen: Boolean = false
  var lo: Long = 0L
  var big: java.math.BigInteger = null

  def add(d: Double): Unit = {
    // the family's documented fixed-point domain contract: a floored term
    // outside the long range (or NaN) fails LOUD, like FLOOR(double)→long
    // under ANSI — never a silent clamp
    if (java.lang.Double.isNaN(d) ||
        d < Long.MinValue.toDouble || d > Long.MaxValue.toDouble)
      throw new ArithmeticException(s"fixed_vec_sum term out of long range: $d")
    seen = true
    val v = d.toLong
    val sum = lo + v
    // overflow check (Math.addExact without the throw)
    if (((lo ^ sum) & (v ^ sum)) < 0) {
      big = (if (big == null) java.math.BigInteger.ZERO else big)
        .add(java.math.BigInteger.valueOf(lo))
      lo = v
    } else lo = sum
  }

  def mergeFrom(o: FixedAcc): Unit = {
    if (o.seen) {
      seen = true
      if (o.big != null) big = (if (big == null) o.big else big.add(o.big))
      val v = o.lo
      val sum = lo + v
      if (((lo ^ sum) & (v ^ sum)) < 0) {
        big = (if (big == null) java.math.BigInteger.ZERO else big)
          .add(java.math.BigInteger.valueOf(lo))
        lo = v
      } else lo = sum
    }
  }

  def total: java.math.BigInteger = {
    val l = java.math.BigInteger.valueOf(lo)
    if (big == null) l else big.add(l)
  }
}

/** Per-dimension Σ_rows floor(t_i·scale + 0.5) over an array<double>
  * column, as array<decimal(38,0)> — value-identical to `dim` separate
  * `sum(cast(floor(t·scale + 0.5) as decimal(38,0)))` columns (NULL for a
  * dimension with no non-null input; ArithmeticException past 38 digits,
  * the ANSI decimal-sum contract) for every FINITE in-long-range term.
  *
  * Intentional divergence on degenerate terms: a NaN or ±Inf (or
  * out-of-long-range) floored term ABORTS loudly ([[FixedAcc.add]]),
  * where the replaced non-ANSI decimal sums silently contributed 0 (NaN)
  * or a clamped extreme (±Inf). A non-finite embedding element means the
  * upstream data is corrupt and every PCA number derived from it garbage —
  * the fixed-point family's documented fail-loud contract — so the kernel
  * refuses rather than reproducing the silent-garbage behavior. */
case class FixedVecSumAgg(child: Expression, dim: Int, scale: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[FixedAcc]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DecimalType(38, 0), containsNull = true)
  override def prettyName: String = "fixed_vec_sum"

  // update() reads elements with getDouble — an array<float> child would be
  // reinterpreted as doubles and silently sum garbage; fail at analysis
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double> input, got $t")
    }

  override def createAggregationBuffer(): Array[FixedAcc] =
    Array.fill(dim)(new FixedAcc)

  override def update(buf: Array[FixedAcc], row: InternalRow): Array[FixedAcc] = {
    val v = child.eval(row)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), dim)
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          buf(i).add(math.floor(a.getDouble(i) * scale + 0.5d))
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[FixedAcc], other: Array[FixedAcc]): Array[FixedAcc] = {
    var i = 0
    while (i < dim) { buf(i).mergeFrom(other(i)); i += 1 }
    buf
  }

  override def eval(buf: Array[FixedAcc]): Any = {
    val out = new Array[Any](dim)
    var i = 0
    while (i < dim) {
      if (buf(i).seen) {
        val d = Decimal(scala.math.BigDecimal(new java.math.BigDecimal(buf(i).total)))
        if (!d.changePrecision(38, 0))
          throw new ArithmeticException(s"fixed_vec_sum overflow at dim $i")
        out(i) = d
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[FixedAcc]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(dim)
    buf.foreach { a =>
      out.writeBoolean(a.seen)
      out.writeLong(a.lo)
      val bb = if (a.big == null) Array.emptyByteArray else a.big.toByteArray
      out.writeInt(bb.length)
      out.write(bb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[FixedAcc] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val d = in.readInt()
    Array.fill(d) {
      val a = new FixedAcc
      a.seen = in.readBoolean()
      a.lo = in.readLong()
      val len = in.readInt()
      if (len > 0) {
        val bb = new Array[Byte](len)
        in.readFully(bb)
        a.big = new java.math.BigInteger(bb)
      }
      a
    }
  }

  override def withNewMutableAggBufferOffset(n: Int): FixedVecSumAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FixedVecSumAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FixedVecSumAgg = copy(child = c.head)
}

object PcaKernels {
  def centeredDot(vec: Column, means: Array[Double], v: Array[Double]): Column =
    Bridge.column(CenteredDotVec(Bridge.expression(vec), means.clone(), v.clone()))
  def deflate(vec: Column, ps: Column, means: Array[Double],
      ws: Seq[Array[Double]]): Column =
    Bridge.column(DeflateVec(Bridge.expression(vec), Bridge.expression(ps),
      means.clone(), ws.map(_.clone())))
  def vecScale(arr: Column, s: Column): Column =
    Bridge.column(VecScale(Bridge.expression(arr), Bridge.expression(s)))
  def vecMul(a: Column, b: Column): Column =
    Bridge.column(VecMul(Bridge.expression(a), Bridge.expression(b)))
  def fixedVecSum(arr: Column, dim: Int, scale: Double): Column =
    Bridge.column(FixedVecSumAgg(Bridge.expression(arr), dim, scale)
      .toAggregateExpression())
}
