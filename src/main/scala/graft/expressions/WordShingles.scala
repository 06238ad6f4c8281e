package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a token array, as one native expression.
  *
  * Replaces the `transform(sequence(...), i -> array_join(slice(toks,i,n)))
  * |> array_distinct` higher-order-function chain: lambda bodies evaluate
  * interpreted (no codegen, no common-subexpression elimination), measured
  * ~1 ms/row on ~100-token documents — two orders of magnitude too slow for
  * a 100 TB dedup pass. This expression is a single tight loop over the
  * token ArrayData with a hash set for distinctness (first-occurrence order,
  * matching array_distinct).
  *
  * Semantics (shared with the DuckDB oracle): n-grams joined by one space;
  * documents shorter than n tokens yield a single shingle of all tokens
  * joined.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val sep = UTF8String.fromString(" ")
    if (len < n) {
      val parts = new Array[UTF8String](len)
      var i = 0
      while (i < len) { parts(i) = arr.getUTF8String(i); i += 1 }
      new GenericArrayData(Array[Any](UTF8String.concatWs(sep, parts: _*)))
    } else if (distinct) {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      val window = new Array[UTF8String](n)
      var i = 0
      while (i <= len - n) {
        var j = 0
        while (j < n) { window(j) = arr.getUTF8String(i + j); j += 1 }
        seen.add(UTF8String.concatWs(sep, window: _*))
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    } else {
      // keep duplicates + positions: the repetition counters (top-n-gram
      // frequency) need every occurrence, not the distinct set
      val out = new Array[Any](len - n + 1)
      val window = new Array[UTF8String](n)
      var i = 0
      while (i <= len - n) {
        var j = 0
        while (j < n) { window(j) = arr.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(sep, window: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

object WordShingles {
  def apply(tokens: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(tokens), n))
  /** Every n-gram occurrence in order (no dedup) — for frequency counts. */
  def all(tokens: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(tokens), n, distinct = false))
}
