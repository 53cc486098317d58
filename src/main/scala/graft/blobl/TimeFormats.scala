package graft.blobl

/** Translation of Go reference-time layouts (`2006-01-02 15:04:05`) and
  * C strftime patterns (`%Y-%m-%d`) to Java `DateTimeFormatter` patterns,
  * needed by the 8 timestamp methods (reference
  * `internal/bloblang/query/methods_strings.go:1126-1467`). Unrecognized
  * alphabetic runs are quoted as literals ('T' etc.).
  */
object TimeFormats {

  // Longest-first Go layout tokens → Java pattern letters.
  private val goTokens: List[(String, String)] = List(
    "2006" -> "yyyy",
    "January" -> "MMMM",
    "Jan" -> "MMM",
    "Monday" -> "EEEE",
    "Mon" -> "EEE",
    ".000000000" -> ".SSSSSSSSS",
    ".000000" -> ".SSSSSS",
    ".000" -> ".SSS",
    ".999999999" -> "[.SSSSSSSSS]",
    ".999999" -> "[.SSSSSS]",
    ".999" -> "[.SSS]",
    "Z07:00:00" -> "XXX",
    "Z070000" -> "XX",
    "Z07:00" -> "XXX",
    "Z0700" -> "XX",
    "Z07" -> "X",
    "-07:00:00" -> "xxx",
    "-070000" -> "xx",
    "-07:00" -> "xxx",
    "-0700" -> "xx",
    "-07" -> "x",
    "15" -> "HH",
    "01" -> "MM",
    "02" -> "dd",
    "03" -> "hh",
    "04" -> "mm",
    "05" -> "ss",
    "06" -> "yy",
    "PM" -> "a",
    "pm" -> "a",
    "MST" -> "zzz",
    "002" -> "DDD",
    "_2" -> "d",
    "2" -> "d",
    "1" -> "M",
    "3" -> "h",
    "4" -> "m",
    "5" -> "s")

  def goToJava(layout: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < layout.length) {
      goTokens.find { case (go, _) => layout.startsWith(go, i) } match {
        case Some((go, java)) => sb.append(java); i += go.length
        case None =>
          val c = layout.charAt(i)
          if (c.isLetter) sb.append('\'').append(c).append('\'')
          else if (c == '\'') sb.append("''")
          else sb.append(c)
          i += 1
      }
    }
    collapseQuotes(sb.toString)
  }

  private val strftimeTokens: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
    'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
    'b' -> "MMM", 'B' -> "MMMM", 'a' -> "EEE", 'A' -> "EEEE",
    'j' -> "DDD", 'p' -> "a", 'z' -> "xx", 'Z' -> "zzz",
    'f' -> "SSSSSS", 'e' -> "d", 'G' -> "YYYY", 'V' -> "ww",
    'u' -> "e", 'T' -> "HH:mm:ss", 'F' -> "yyyy-MM-dd")

  def strftimeToJava(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        val d = fmt.charAt(i + 1)
        if (d == '%') sb.append('%')
        else sb.append(strftimeTokens.getOrElse(d, d.toString))
        i += 2
      } else {
        if (c.isLetter) sb.append('\'').append(c).append('\'')
        else if (c == '\'') sb.append("''")
        else sb.append(c)
        i += 1
      }
    }
    collapseQuotes(sb.toString)
  }

  /** 'T''Z' → 'TZ' style merge of adjacent quoted literals. (Also collapses
    * a literal escaped quote — layouts containing a single quote are
    * vanishingly rare.) */
  private def collapseQuotes(s: String): String = s.replace("''", "")
}
