package graft.core

/** Python-string-semantics helpers.
  *
  * The reference's observable outputs (prompt templates, chunk byte
  * budgets, the Echo test functor) are defined in terms of Python
  * string operations; these helpers reproduce them exactly so that
  * golden outputs match byte-for-byte.
  */
object PyText {

  /** UTF-8 byte length of a string without allocating the byte array.
    * Equivalent to Python `len(s.encode('utf8'))`.
    */
  def utf8Len(s: String): Long = {
    var n = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if (c < 0x80) n += 1
      else if (c < 0x800) n += 2
      else if (Character.isHighSurrogate(c) && i + 1 < len &&
        Character.isLowSurrogate(s.charAt(i + 1))) { n += 4; i += 1 }
      else n += 3
      i += 1
    }
    n
  }

  /** Python `str.split('\n')` — keeps leading/trailing empty strings
    * (unlike Java's default `String.split`).
    */
  def splitLines(s: String): Array[String] = s.split("\n", -1)

  /** Python `repr(s)` for str — used verbatim inside the mapreduce
    * prompt templates (reference mapreduce.py:42,96,234,262 embed
    * `repr(question)`).
    */
  def pyRepr(s: String): String = {
    val useDouble = s.contains('\'') && !s.contains('"')
    val quote = if (useDouble) '"' else '\''
    val sb = new StringBuilder
    sb.append(quote)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case c if c == quote => sb.append('\\').append(c)
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 || c == 0x7f => sb.append(f"\\x${c.toInt}%02x")
      case c => sb.append(c)
    }
    sb.append(quote)
    sb.toString
  }

  /** Python `s[::rate]` — every rate-th character starting at 0.
    * The reference's lossy Echo test functor is `text[::2]`
    * (frontend.py:289-293).
    */
  def everyNth(s: String, rate: Int): String = {
    val sb = new StringBuilder((s.length + rate - 1) / rate)
    var i = 0
    while (i < s.length) { sb.append(s.charAt(i)); i += rate }
    sb.toString
  }

  /** Minimal Python `str.format` with positional `{}` / `{0}`
    * placeholders — enough for the reference's wrap templates
    * (reader.py:786-810). `{{`/`}}` escape to literal braces.
    */
  def pyFormat(template: String, args: Any*): String = {
    val sb = new StringBuilder
    var i = 0
    var auto = 0
    while (i < template.length) {
      val c = template.charAt(i)
      if (c == '{' && i + 1 < template.length && template.charAt(i + 1) == '{') {
        sb.append('{'); i += 2
      } else if (c == '}' && i + 1 < template.length && template.charAt(i + 1) == '}') {
        sb.append('}'); i += 2
      } else if (c == '{') {
        val close = template.indexOf('}', i)
        require(close >= 0, s"unclosed placeholder in $template")
        val spec = template.substring(i + 1, close)
        val idx = if (spec.isEmpty) { val a = auto; auto += 1; a } else spec.toInt
        sb.append(args(idx).toString)
        i = close + 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Word-safe truncation with ` [...]` placeholder, approximating
    * Python `textwrap.shorten` (reference mapreduce.py:33-38,
    * vectordb.py:237). Display-only — never on the data path.
    */
  def shorten(s: String, maxLen: Int = 100): String = {
    val collapsed = s.split("\\s+").filter(_.nonEmpty).mkString(" ")
    if (collapsed.length <= maxLen) collapsed
    else {
      val placeholder = " [...]"
      val budget = maxLen - placeholder.length
      val words = collapsed.split(" ")
      val sb = new StringBuilder
      var i = 0
      while (i < words.length &&
        (sb.length + (if (sb.isEmpty) 0 else 1) + words(i).length) <= budget) {
        if (sb.nonEmpty) sb.append(' ')
        sb.append(words(i)); i += 1
      }
      if (sb.isEmpty) placeholder.trim else sb.append(placeholder).toString
    }
  }

  /** Blank-line squeeze used after HTML→text extraction
    * (reference reader.py:461-466): collapse 3+ consecutive newlines
    * to exactly two, after per-line rstrip.
    */
  def squeezeBlankLines(s: String): String =
    splitLines(s).map(_.replaceAll("\\s+$", "")).mkString("\n")
      .replaceAll("\n{3,}", "\n\n")
}
