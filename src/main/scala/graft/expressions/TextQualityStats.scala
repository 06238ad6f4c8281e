package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All Gopher-quality counters in ONE pass over the document text.
  *
  * Replaces five separate regex scans (`regexp_count('\S+')`,
  * `char_length(regexp_replace('\s+'))`, `regexp_count('#'|'...')`,
  * `regexp_count('\S*[A-Za-z]\S*')`, `array_intersect(split(lower))`)
  * measured at ~160 µs/doc on 300-char documents — linear but
  * constant-heavy for a filter that fronts every corpus ingest.
  *
  * Field semantics are bit-identical to the regex formulation (the DuckDB
  * oracle for q_quality_gopher is unchanged and still hash-matches):
  *   - word_count: maximal runs of non-whitespace (`\S+`), whitespace =
  *     Java regex `\s` = [ \t\n\f\r]
  *   - nonws_chars: CODE POINTS outside `\s` (char_length semantics —
  *     low surrogates don't count)
  *   - symbol_count: '#' occurrences + non-overlapping '...' triplets +
  *     '…' occurrences (the `\.\.\.|…` alternation)
  *   - alpha_words: words containing at least one ASCII letter
  *   - stopword_hits: how many DISTINCT stopwords occur as whole
  *     (lowercased) tokens
  */
case class TextQualityStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(stopwords.nonEmpty && stopwords.length <= 30,
    "stopword bitmask supports 1..30 words")

  override def dataType: DataType = StructType(Seq(
    StructField("word_count", IntegerType, nullable = false),
    StructField("nonws_chars", IntegerType, nullable = false),
    StructField("symbol_count", IntegerType, nullable = false),
    StructField("alpha_words", IntegerType, nullable = false),
    StructField("stopword_hits", IntegerType, nullable = false)))

  @transient private lazy val stops: Array[String] =
    stopwords.map(_.toLowerCase).toArray
  @transient private lazy val maxStopLen: Int = stops.map(_.length).max

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    var wc, nonws, sym, alphaWords = 0
    var stopMask = 0
    var inWord = false
    var wordHasAlpha = false
    var wordLen = 0 // in code points
    var dotRun = 0
    val buf = new java.lang.StringBuilder(maxStopLen)

    def flushWord(): Unit = if (inWord) {
      wc += 1
      if (wordHasAlpha) alphaWords += 1
      if (wordLen <= maxStopLen && buf.length == wordLen) {
        val w = buf.toString
        var j = 0
        while (j < stops.length) {
          if (stops(j).length == wordLen && stops(j) == w) stopMask |= 1 << j
          j += 1
        }
      }
      inWord = false; wordHasAlpha = false; wordLen = 0; buf.setLength(0)
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
      if (isWs) {
        flushWord()
        dotRun = 0
      } else {
        if (!Character.isLowSurrogate(c)) { nonws += 1; wordLen += 1 }
        inWord = true
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) {
          wordHasAlpha = true
          if (buf.length < maxStopLen)
            buf.append(if (c <= 'Z' && c >= 'A') (c + 32).toChar else c)
        } else if (buf.length < maxStopLen && !Character.isLowSurrogate(c)) {
          buf.append(c)
        }
        if (c == '#') sym += 1
        if (c == '…') sym += 1
        if (c == '.') {
          dotRun += 1
          if (dotRun == 3) { sym += 1; dotRun = 0 } // non-overlapping '...'
        } else dotRun = 0
      }
      i += 1
    }
    flushWord()
    new GenericInternalRow(Array[Any](
      wc, nonws, sym, alphaWords, Integer.bitCount(stopMask)))
  }

  override protected def withNewChildInternal(newChild: Expression): TextQualityStats =
    copy(child = newChild)
  override def prettyName: String = "text_quality_stats"
}

object TextQualityStats {
  def apply(text: Column, stopwords: Seq[String]): Column =
    Bridge.column(TextQualityStats(Bridge.expression(text), stopwords))
}
