package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Token-array kernels replacing the last interpreted lambdas in the text
  * layer. Both are [[CodegenFallback]] like [[WordShingles]] — the measured
  * 20× HOF penalty is interpreted-lambda machinery (boxed rows, a fresh
  * closure evaluation per element), not the absence of codegen; a tight
  * JVM loop over ArrayData removes it. */

/** Occurrence count of tokens that belong to a fixed word set — replaces
  * `size(filter(toks, t -> t.isin(words)))` (per-element interpreted
  * lambda, re-run per language in the language-ID argmax). Counts
  * DUPLICATE occurrences, exactly like the filter form. */
case class TokenSetHits(child: Expression, words: Seq[String])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_set_hits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> input, got $t")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetHits =
    copy(child = newChild)
}

/** 1-of-n winnowing fingerprint: min over xxhash64 of every `w`-token
  * window (space-joined) — replaces the
  * `array_min(transform(sequence(...), i -> xxhash64(array_join(slice...))))`
  * chain, which evaluated interpreted AND re-sliced a fresh window array
  * per position. Bit-identical values: each window is `concatWs(" ")` of
  * the tokens then hashed with the `xxhash64` seed (42); fewer than `w`
  * tokens (including zero) hashes the whole joined array once, matching
  * `slice`'s clamping on the single `i=0` window. */
case class WinnowMinHash(child: Expression, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(w >= 1, "window must be >= 1")
  override def dataType: DataType = LongType
  override def prettyName: String = "winnow_min_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string> input, got $t")
  }

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n <= w) {
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i < n) { parts(i) = arr.getUTF8String(i); i += 1 }
      XXH64.hashUTF8String(UTF8String.concatWs(sep, parts: _*), 42L)
    } else {
      val window = new Array[UTF8String](w)
      var min = Long.MaxValue
      var i = 0
      while (i <= n - w) {
        var j = 0
        while (j < w) { window(j) = arr.getUTF8String(i + j); j += 1 }
        val h = XXH64.hashUTF8String(UTF8String.concatWs(sep, window: _*), 42L)
        if (h < min) min = h
        i += 1
      }
      min
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowMinHash =
    copy(child = newChild)
}

/** Unicode normalization (UAX#15) of a string column — the text-canonical-
  * ization step every multilingual corpus pipeline runs before hashing or
  * dedup (composed vs decomposed accents would otherwise hash apart).
  * Forms: NFC/NFD/NFKC/NFKD via `java.text.Normalizer`. The fast path
  * skips allocation when the input is already normalized ASCII (the
  * overwhelmingly common case in web corpora). NFC output is engine-
  * portable: DuckDB's `nfc_normalize` implements the same UAX#15 form,
  * which is what makes the gate oracle-checkable. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  @transient private lazy val nf =
    java.text.Normalizer.Form.valueOf(form.toUpperCase)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string input, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, nf)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, nf))
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object TextKernels {
  def tokenSetHits(toks: Column, words: Seq[String]): Column =
    Bridge.column(TokenSetHits(Bridge.expression(toks), words))
  def winnowMinHash(toks: Column, w: Int): Column =
    Bridge.column(WinnowMinHash(Bridge.expression(toks), w))
  def unicodeNormalize(s: Column, form: String = "NFC"): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(s), form))
}
