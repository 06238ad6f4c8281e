package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** All ordered pairs (i<j) of a sorted array<struct<id, n>> as
  * array<struct<a, b, na, nb>> — the pair-generation kernel of the
  * inverted-index Jaccard join.
  *
  * A native expression for the same reason as [[WordShingles]]: the nested
  * `transform(sequence, i -> transform(sequence, j -> struct(...)))`
  * formulation evaluates interpreted per element with repeated element_at
  * walks; this is one tight O(k²) loop over the ArrayData. Input arrays are
  * bounded by the caller's maxDf cap, so k² stays controlled.
  */
case class PairCombos(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private def elemType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def dataType: DataType = {
    val idT = elemType.fields(0).dataType
    val nT = elemType.fields(1).dataType
    ArrayType(StructType(Seq(
      StructField("a", idT), StructField("b", idT),
      StructField("na", nT), StructField("nb", nT))), containsNull = false)
  }

  override def nullSafeEval(input: Any): Any = {
    val idT = elemType.fields(0).dataType
    val nT = elemType.fields(1).dataType
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    // extract once: getStruct may return a buffer-backed row
    val ids = new Array[Any](n)
    val counts = new Array[Any](n)
    var i = 0
    while (i < n) {
      val s = arr.getStruct(i, 2)
      ids(i) = s.get(0, idT)
      counts(i) = s.get(1, nT)
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val row = new GenericInternalRow(4)
        row.update(0, ids(i)); row.update(1, ids(j))
        row.update(2, counts(i)); row.update(3, counts(j))
        out(k) = row
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PairCombos =
    copy(child = newChild)
  override def prettyName: String = "pair_combos"
}

object PairCombos {
  def apply(docs: Column): Column = Bridge.column(PairCombos(Bridge.expression(docs)))
}
