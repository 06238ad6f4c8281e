package graft.functions

/** chrono/strftime → Java DateTimeFormatter pattern translation.
  *
  * The reference's `str.to_date`/`to_datetime`/`dt.strftime` take chrono
  * format strings (`%Y-%m-%d %H:%M:%S`, reference:
  * client/td-sdk/tabsdata/tableframe/expr/string.py:41-135); Spark's
  * `to_date`/`date_format` take Java patterns (`yyyy-MM-dd HH:mm:ss`).
  * This is the shared translator (SURVEY §2.7 "chrono→Java format translator").
  */
object ChronoFormat {
  /** Week-based chrono specifiers have no legal Java pattern in Spark ≥ 3.0
    * (DateTimeFormatterHelper bans Y/W/w/u/e/c) — reject them loudly instead
    * of emitting a pattern that throws deep inside an executor. */
  private val unsupportedWeekBased = Set('U', 'W', 'V', 'G', 'u', 'w')

  private val mapping: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'C' -> "",   // %C century handled below
    'm' -> "MM", 'b' -> "MMM", 'h' -> "MMM", 'B' -> "MMMM",
    'd' -> "dd", 'e' -> "d", 'a' -> "EEE", 'A' -> "EEEE",
    'j' -> "DDD",
    'H' -> "HH", 'k' -> "H", 'I' -> "hh", 'l' -> "h",
    'M' -> "mm", 'S' -> "ss",
    'p' -> "a", 'P' -> "a",
    'f' -> "SSSSSSSSS",   // nanoseconds since last second
    'Z' -> "zzz", 'z' -> "xx",
    'F' -> "yyyy-MM-dd", 'D' -> "MM/dd/yy",
    'T' -> "HH:mm:ss", 'R' -> "HH:mm",
    's' -> "",            // epoch seconds — not expressible as a pattern
    'n' -> "\n", 't' -> "\t")

  /** Translate a chrono format string to a Java DateTimeFormatter pattern.
    * Literal text is single-quoted where it contains pattern letters. */
  def toJava(chrono: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flush(): Unit = {
      if (lit.nonEmpty) {
        val s = lit.toString
        if (s.exists(c => c.isLetter || c == '\''))
          out.append("'").append(s.replace("'", "''")).append("'")
        else out.append(s)
        lit.clear()
      }
    }
    var i = 0
    while (i < chrono.length) {
      val c = chrono.charAt(i)
      if (c == '%' && i + 1 < chrono.length) {
        val n = chrono.charAt(i + 1)
        i += 2
        n match {
          case '%' => lit.append('%')
          case '.' => // %.f / %.3f precision prefix — consume digits then f
            var j = i
            while (j < chrono.length && chrono.charAt(j).isDigit) j += 1
            if (j < chrono.length && chrono.charAt(j) == 'f') {
              flush()
              val digits = chrono.substring(i, j)
              val width = if (digits.isEmpty) 9 else digits.toInt
              out.append("." + "S" * width)
              i = j + 1
            }
          case '3' | '6' | '9' if i < chrono.length && chrono.charAt(i) == 'f' =>
            flush(); out.append("S" * (n - '0')); i += 1
          case other if unsupportedWeekBased(other) =>
            throw new IllegalArgumentException(
              s"chrono specifier %$other is week-based; Spark ≥ 3.0 rejects week-based " +
                "datetime patterns — use dt.week/dt.iso_year instead")
          case other =>
            mapping.get(other) match {
              case Some(p) => flush(); out.append(p)
              case None    => lit.append('%').append(other)
            }
        }
      } else { lit.append(c); i += 1 }
    }
    flush()
    out.toString
  }
}
