package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.types._

import graft.core.Expr

/** Grok pattern support (reference: frame.py:2679-2782, string.py:1122; Rust
  * engine expansions/polars/modules/ty-tableframe/src/tableframe/features/grok/
  * engine/functions.rs:14-58).
  *
  * Design: the grok pattern is compiled **once on the driver** into a plain
  * Java regex plus an ordered capture list; per-row extraction is expressed
  * with Spark's codegen'd `regexp_extract`, so the hot path is whole-stage
  * codegen with no UDF. Non-matching rows yield null fields (matching the
  * reference's null-fill semantics). Typed captures (`%{INT:age:int}`) cast
  * with try_cast.
  */
object GrokFunctions {
  /** Core grok pattern dictionary (the common subset of the standard
    * grok-patterns file, re-expressed from public grok documentation). */
  val Patterns: Map[String, String] = {
    val base = mutable.LinkedHashMap[String, String](
      "USERNAME" -> "[a-zA-Z0-9._-]+",
      "INT" -> "(?:[+-]?(?:[0-9]+))",
      "BASE10NUM" -> "(?:[+-]?(?:[0-9]+(?:\\.[0-9]+)?)|\\.[0-9]+)",
      "BASE16NUM" -> "(?:0[xX])?[0-9a-fA-F]+",
      "POSINT" -> "\\b(?:[1-9][0-9]*)\\b",
      "NONNEGINT" -> "\\b(?:[0-9]+)\\b",
      "WORD" -> "\\b\\w+\\b",
      "NOTSPACE" -> "\\S+",
      "SPACE" -> "\\s*",
      "DATA" -> ".*?",
      "GREEDYDATA" -> ".*",
      "QUOTEDSTRING" -> "(?:\"[^\"]*\"|'[^']*')",
      "UUID" -> "[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
      "IPV4" -> "(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
      "HOSTNAME" -> "\\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\\.?\\b",
      "MONTHNUM" -> "(?:0?[1-9]|1[0-2])",
      "MONTHDAY" -> "(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
      "YEAR" -> "(?:\\d\\d){1,2}",
      "HOUR" -> "(?:2[0123]|[01]?[0-9])",
      "MINUTE" -> "(?:[0-5][0-9])",
      "SECOND" -> "(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
      "LOGLEVEL" -> "(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo(?:rmation)?|INFO(?:RMATION)?|[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)")
    base += ("NUMBER" -> s"(?:${base("BASE10NUM")})")
    base += ("USER" -> s"(?:${base("USERNAME")})")
    base += ("IP" -> s"(?:${base("IPV4")})")
    base += ("TIME" -> s"(?!<[0-9])${base("HOUR")}:${base("MINUTE")}(?::${base("SECOND")})(?![0-9])")
    base += ("DATE_US" -> s"${base("MONTHNUM")}[/-]${base("MONTHDAY")}[/-]${base("YEAR")}")
    base += ("TIMESTAMP_ISO8601" -> s"${base("YEAR")}-${base("MONTHNUM")}-${base("MONTHDAY")}[T ]${base("HOUR")}:?${base("MINUTE")}(?::?${base("SECOND")})?(?:Z|[+-]${base("HOUR")}(?::?${base("MINUTE")}))?")
    base.toMap
  }

  private val fieldRe = "%\\{(\\w+)(?::(\\w+))?(?::(\\w+))?\\}".r

  /** A compiled grok pattern: final regex + ordered (name, sparkType). */
  final case class Compiled(regex: String, fields: Seq[(String, DataType)])

  /** Neutralize user-written capturing groups: field extraction relies on
    * capture-group i+1 belonging to field i, so a raw `(` in the pattern
    * would shift every field onto the wrong group. Escaped `\(` and
    * already-non-capturing `(?` are left alone. */
  private def neutralizeUserGroups(p: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == '\\' && i + 1 < p.length) { sb.append(c).append(p.charAt(i + 1)); i += 2 }
      else if (c == '(' && (i + 1 >= p.length || p.charAt(i + 1) != '?')) {
        sb.append("(?:"); i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def compile(pattern0: String): Compiled = {
    val pattern = neutralizeUserGroups(pattern0)
    val fields = mutable.ArrayBuffer[(String, DataType)]()
    def expand(p: String, depth: Int): String = {
      require(depth < 20, "grok pattern recursion too deep")
      fieldRe.replaceAllIn(p, m => {
        val syntax = m.group(1)
        val name = Option(m.group(2))
        val typ = Option(m.group(3))
        val sub = Patterns.getOrElse(syntax,
          throw new IllegalArgumentException(s"unknown grok pattern %{$syntax}"))
        val body = expand(sub, depth + 1)
        name match {
          case Some(n) =>
            fields += ((n, typ match {
              case Some("int") | Some("long") => LongType
              case Some("float") | Some("double") => DoubleType
              case _ => StringType
            }))
            java.util.regex.Matcher.quoteReplacement(s"($body)")
          case None => java.util.regex.Matcher.quoteReplacement(s"(?:$body)")
        }
      })
    }
    val regex = expand(pattern, 0)
    Compiled(regex, fields.toSeq)
  }

  /** grok → one struct column; null-valued fields on non-matching rows.
    * Pure `regexp_extract` composition — stays in whole-stage codegen. */
  def grokExpr(col: Column, pattern: String): Expr = {
    val compiled = compile(pattern)
    val matched = F.regexp_like(col, F.lit(compiled.regex))
    val parts = compiled.fields.zipWithIndex.map { case ((name, t), i) =>
      val raw = F.when(matched, F.regexp_extract(col, compiled.regex, i + 1))
      (if (t == StringType) raw else raw.try_cast(t)).as(name)
    }
    Expr(F.struct(parts: _*))
  }

  /** grok → one column per capture (used by TableFrame.grok). */
  def grokColumns(col: Column, pattern: String): Seq[Column] = {
    val compiled = compile(pattern)
    val matched = F.regexp_like(col, F.lit(compiled.regex))
    compiled.fields.zipWithIndex.map { case ((name, t), i) =>
      val raw = F.when(matched, F.regexp_extract(col, compiled.regex, i + 1))
      (if (t == StringType) raw else raw.try_cast(t)).as(name)
    }
  }
}
