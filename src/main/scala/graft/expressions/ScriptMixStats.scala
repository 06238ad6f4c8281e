package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All six script-range counters + digits + the total char count in ONE
  * code-point pass over the document text.
  *
  * Replaces seven separate `regexp_count(text, '[range]')` scans (plus
  * the `char_length` total) — the heaviest per-byte constant in the
  * corpus-card path (the r14 card probe measured the staged regex
  * counters as the dominant cost; the same fold on the Gopher counters
  * bought 9.3×, [[TextQualityStats]]).
  *
  * Field semantics are BIT-IDENTICAL to the regex formulation
  * ([[graft.pipeline.TextAnalysis.ScriptRanges]] — the q_text_scripts /
  * q_corpus_card oracles are unchanged):
  *   - each counter counts CODE POINTS inside its explicit range set
  *     (the ranges are BMP-only, so a surrogate pair can never match);
  *     counters are independent, not exclusive, exactly like one
  *     regexp_count per range
  *   - n_chars is `char_length(text)` (code points — a surrogate pair
  *     counts once)
  */
case class ScriptMixStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_latin", IntegerType, nullable = false),
    StructField("n_cyrillic", IntegerType, nullable = false),
    StructField("n_greek", IntegerType, nullable = false),
    StructField("n_arabic", IntegerType, nullable = false),
    StructField("n_cjk", IntegerType, nullable = false),
    StructField("n_digit", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    var latin, cyr, greek, arab, cjk, digit, total = 0
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      total += 1
      // graft.pipeline.TextAnalysis.ScriptRanges, literal for literal
      if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= 0x00C0 && cp <= 0x024F)) latin += 1
      if (cp >= 0x0400 && cp <= 0x04FF) cyr += 1
      if (cp >= 0x0370 && cp <= 0x03FF) greek += 1
      if (cp >= 0x0600 && cp <= 0x06FF) arab += 1
      if ((cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3040 && cp <= 0x30FF) ||
        (cp >= 0xAC00 && cp <= 0xD7AF)) cjk += 1
      if (cp >= '0' && cp <= '9') digit += 1
      i += Character.charCount(cp)
    }
    new GenericInternalRow(Array[Any](
      latin, cyr, greek, arab, cjk, digit, total))
  }

  override protected def withNewChildInternal(newChild: Expression): ScriptMixStats =
    copy(child = newChild)
  override def prettyName: String = "script_mix_stats"
}

object ScriptMixStats {
  def apply(text: Column): Column =
    Bridge.column(ScriptMixStats(Bridge.expression(text)))
}
