package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** Row-local product-quantization kernels (guide §2.4 / §4.1): nearest-code
  * assignment and asymmetric-distance (ADC) scoring as single codegen'd
  * expressions over a codebook held as a task reference object.
  *
  * Why: the original PQ assignment was a broadcast join of the subvector
  * relation against the (sub, code, cv) codebook — a ks× row blow-up
  * (corpus·m·ks intermediate rows) followed by a groupBy(id, sub) argmin
  * shuffle and a re-join with the subvectors, i.e. three exchanges per
  * Lloyd pass to compute something that is a pure function of one row.
  * These kernels make assignment and ADC scoring zero-shuffle: the codebook
  * (m·ks·dsub doubles, bounded metadata) ships once per task inside the
  * serialized plan, and each row pays one primitive-loop scan.
  *
  * Bit-parity contract (the exact-twin oracles depend on it):
  *   - assignment distance is the [[VectorFold]] sqdist association —
  *     d += (x−c)² left-to-right within the subvector, elements widened to
  *     double exactly like `slice(cast(vec as array<double>))`;
  *   - argmin ties break to the LOWEST code, and NaN orders greatest
  *     (Spark's nan-safe double ordering, matching `min(struct(d, code))`);
  *   - ADC dot folds per-sub subtotals in sub order and adds each subtotal
  *     to the running sum — the same association as both the HOF literal
  *     path and the join path's sort-by-sub fold it replaces.
  */
/** How a kernel's codebook reaches the task: inline in the serialized plan
  * (small codebooks — zero indirection) or as a Spark `Broadcast` handle
  * (large codebooks — the task binary carries only the handle; executors
  * fetch the array once from the block manager instead of once per task,
  * removing the r17 local-mode assumption of a multi-MB reference object
  * riding every serialized task). Both resolve to the SAME array values,
  * so kernel results are bit-identical across transports. */
sealed trait PqCodebookRef extends Serializable {
  def m: Int
  def ks: Int
  def dsub: Int
  /** The resolved codebook — called once per task/partition, not per row. */
  def resolve(): Array[Array[Array[Double]]]
}

final case class PqCodebookInline(centroids: Array[Array[Array[Double]]])
    extends PqCodebookRef {
  override def m: Int = centroids.length
  override def ks: Int = centroids(0).length
  override def dsub: Int = centroids(0)(0).length
  override def resolve(): Array[Array[Array[Double]]] = centroids
}

final case class PqCodebookBroadcast(
    handle: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Double]]]],
    m: Int, ks: Int, dsub: Int) extends PqCodebookRef {
  override def resolve(): Array[Array[Array[Double]]] = handle.value
}

trait PqCodebookKernel {
  /** The codebook transport; centroids(sub)(code) is a dsub-dim vector. */
  def cbRef: PqCodebookRef
  @transient protected lazy val centroids: Array[Array[Array[Double]]] =
    cbRef.resolve()
  protected def m: Int = cbRef.m
  protected def ks: Int = cbRef.ks
  protected def dsub: Int = cbRef.dsub
  protected def dim: Int = m * dsub

  /** Generated-class field holding the resolved codebook: initialized once
    * per generated instance from the serialized ref, so codegen'd row loops
    * index a plain double[][][] with no per-row indirection. */
  protected def codebookVar(ctx: CodegenContext): String = {
    val refName = ctx.addReferenceObj("pqCodebookRef", cbRef,
      classOf[PqCodebookRef].getName)
    ctx.addMutableState("double[][][]", "pqCb",
      v => s"$v = ((${classOf[PqCodebookRef].getName}) $refName).resolve();",
      forceInline = true)
  }
}

/** codes array<int> (length m) of the nearest per-subspace centroids for a
  * full vector. NULL when the input is null, has the wrong length, or
  * carries a null element (the sliced-subvector formulation it replaces
  * nulls out the same way through zip_with padding). */
case class PqAssignCodes(child: Expression, cbRef: PqCodebookRef)
    extends UnaryExpression with PqCodebookKernel {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_assign"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double> input, got $t")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cs = centroids(s)
      var best = 0.0
      var bestC = 0
      var c = 0
      while (c < ks) {
        val cv = cs(c)
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val t = x(s * dsub + j) - cv(j)
          d += t * t
          j += 1
        }
        if (c == 0 || d < best ||
            (java.lang.Double.isNaN(best) && !java.lang.Double.isNaN(d))) {
          best = d; bestC = c
        }
        c += 1
      }
      codes(s) = bestC
      s += 1
    }
    new GenericArrayData(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = codebookVar(ctx)
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val x = ctx.freshName("x"); val codes = ctx.freshName("codes")
      val s = ctx.freshName("s"); val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
      val d = ctx.freshName("d"); val t = ctx.freshName("t"); val cs = ctx.freshName("cs")
      val cv = ctx.freshName("cv")
      s"""
         |if ($v.numElements() != $dim) { ${ev.isNull} = true; } else {
         |  double[] $x = new double[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $x[$i] = (double) $v.$get($i);
         |  }
         |  if (!${ev.isNull}) {
         |    int[] $codes = new int[$m];
         |    for (int $s = 0; $s < $m; $s++) {
         |      double[][] $cs = $cb[$s];
         |      double $best = 0.0; int $bestC = 0;
         |      for (int $c = 0; $c < $ks; $c++) {
         |        double[] $cv = $cs[$c];
         |        double $d = 0.0;
         |        for (int $j = 0; $j < $dsub; $j++) {
         |          double $t = $x[$s * $dsub + $j] - $cv[$j];
         |          $d += $t * $t;
         |        }
         |        if ($c == 0 || $d < $best ||
         |            (java.lang.Double.isNaN($best) && !java.lang.Double.isNaN($d))) {
         |          $best = $d; $bestC = $c;
         |        }
         |      }
         |      $codes[$s] = $bestC;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssignCodes =
    copy(child = newChild)
}

/** ADC dot product ⟨q, x̂⟩ = Σ_sub ⟨q_sub, centroid(sub)(code_sub)⟩ of a
  * full-precision query vector against an m-length code array. Folds one
  * per-sub subtotal at a time in sub order (see class doc). NULL on null
  * input, wrong query length, code-count mismatch, or null elements. */
case class PqAdcDot(left: Expression, right: Expression, cbRef: PqCodebookRef)
    extends BinaryExpression with PqCodebookKernel {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val lOk = left.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val rOk = right.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (lOk && rOk) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float|double>, array<int>), got " +
        s"${left.dataType} / ${right.dataType}")
  }

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val q = l.asInstanceOf[ArrayData]
    val c = r.asInstanceOf[ArrayData]
    if (q.numElements() != dim || c.numElements() != m) return null
    var dot = 0.0
    var s = 0
    while (s < m) {
      if (c.isNullAt(s)) return null
      val cv = centroids(s)(c.getInt(s))
      var sub = 0.0
      var j = 0
      while (j < dsub) {
        val i = s * dsub + j
        if (q.isNullAt(i)) return null
        val x = if (isFloat) q.getFloat(i).toDouble else q.getDouble(i)
        sub += x * cv(j)
        j += 1
      }
      dot += sub
      s += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = codebookVar(ctx)
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val dot = ctx.freshName("dot"); val s = ctx.freshName("s")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val sub = ctx.freshName("sub"); val cv = ctx.freshName("cv")
      s"""
         |if ($q.numElements() != $dim || $c.numElements() != $m) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $s = 0; $s < $m && !${ev.isNull}; $s++) {
         |    if ($c.isNullAt($s)) { ${ev.isNull} = true; break; }
         |    double[] $cv = $cb[$s][$c.getInt($s)];
         |    double $sub = 0.0;
         |    for (int $j = 0; $j < $dsub; $j++) {
         |      int $i = $s * $dsub + $j;
         |      if ($q.isNullAt($i)) { ${ev.isNull} = true; break; }
         |      $sub += ((double) $q.$get($i)) * $cv[$j];
         |    }
         |    if (!${ev.isNull}) { $dot += $sub; }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $dot; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcDot =
    copy(left = l, right = r)
}

object PqKernels {
  def assign(vec: Column, centroids: Array[Array[Array[Double]]]): Column =
    assign(vec, PqCodebookInline(centroids))
  def adcDot(qv: Column, codes: Column, centroids: Array[Array[Array[Double]]]): Column =
    adcDot(qv, codes, PqCodebookInline(centroids))
  def assign(vec: Column, ref: PqCodebookRef): Column =
    Bridge.column(PqAssignCodes(Bridge.expression(vec), ref))
  def adcDot(qv: Column, codes: Column, ref: PqCodebookRef): Column =
    Bridge.column(PqAdcDot(Bridge.expression(qv), Bridge.expression(codes), ref))
}
