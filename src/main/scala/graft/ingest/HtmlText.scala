package graft.ingest

/** HTML → visible text with BeautifulSoup-`get_text()` fidelity
  * (reference reader.py:461-466: `BeautifulSoup(content,
  * features='html.parser').get_text()`).
  *
  * bs4's html.parser tree builder wraps Python's stdlib
  * `html.parser.HTMLParser` (convert_charrefs=True); this object
  * reproduces that tokenizer plus bs4 ≥4.9's `get_text` typing rules:
  *
  *  - text runs between markup are emitted, with character references
  *    decoded by the stdlib `html.unescape` algorithm (full HTML5
  *    named table — resource generated from Python's
  *    `html.entities.html5` by tools/gen_html_entities.py — with
  *    longest-prefix matching for the legacy no-semicolon forms, and
  *    the spec's numeric-reference remapping);
  *  - `<script>`/`<style>` content parses in CDATA mode (runs to the
  *    matching `</tag`, no charref decoding) and is EXCLUDED — bs4
  *    types it Script/Stylesheet, which `get_text` skips;
  *  - text anywhere inside `<template>` is excluded (bs4's
  *    string-container stack: the nearest *container* element wins,
  *    regardless of non-container tags in between);
  *  - comments, doctype/marked-section declarations, processing
  *    instructions and bogus comments are markup, never text;
  *  - a `<` not opening markup (not followed by a letter, `/`, `!` or
  *    `?`) is literal text, as in the stdlib tokenizer.
  *
  * Parity is asserted against the stdlib tokenizer itself:
  * tools/gen_html_golden.py runs `html.parser` + these typing rules +
  * the reference's post-pipeline over fixture documents, and
  * HtmlTextSpec compares byte-for-byte.
  */
object HtmlText {

  // ------------------------------------------------------ entity table
  private lazy val html5Entities: Map[String, String] = {
    val in = getClass.getResourceAsStream("/graft/html5_entities.tsv")
    require(in != null, "html5_entities.tsv resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { line =>
      val Array(name, cps) = line.split("\t", 2)
      val value = cps.split(",").map(h => Integer.parseInt(h, 16))
        .foldLeft(new StringBuilder)((sb, cp) => sb.appendAll(Character.toChars(cp)))
        .toString
      name -> value
    }.toMap
    finally src.close()
  }

  /** Windows-1252 remapping of the C0/C1 numeric references
    * (Python `html._invalid_charrefs`, WHATWG spec table).
    */
  private val invalidCharrefs: Map[Int, String] = Map(
    0x00 -> "�", 0x0d -> "\r", 0x80 -> "€", 0x81 -> "",
    0x82 -> "‚", 0x83 -> "ƒ", 0x84 -> "„", 0x85 -> "…",
    0x86 -> "†", 0x87 -> "‡", 0x88 -> "ˆ", 0x89 -> "‰",
    0x8a -> "Š", 0x8b -> "‹", 0x8c -> "Œ", 0x8d -> "",
    0x8e -> "Ž", 0x8f -> "", 0x90 -> "", 0x91 -> "‘",
    0x92 -> "’", 0x93 -> "“", 0x94 -> "”", 0x95 -> "•",
    0x96 -> "–", 0x97 -> "—", 0x98 -> "˜", 0x99 -> "™",
    0x9a -> "š", 0x9b -> "›", 0x9c -> "œ", 0x9d -> "",
    0x9e -> "ž", 0x9f -> "Ÿ")

  /** Python `html._invalid_codepoints` — references removed outright. */
  private def isInvalidCodepoint(cp: Int): Boolean =
    (cp >= 0x01 && cp <= 0x08) || cp == 0x0b || (cp >= 0x0e && cp <= 0x1f) ||
      (cp >= 0x7f && cp <= 0x9f) || (cp >= 0xfdd0 && cp <= 0xfdef) ||
      ((cp & 0xfffe) == 0xfffe && cp <= 0x10ffff)

  private val CharrefPattern =
    java.util.regex.Pattern.compile("&(#[0-9]+;?|#[xX][0-9a-fA-F]+;?|[^\t\n\f <&#;]{1,32};?)")

  private def decodeNumeric(body: String): String = {
    // body like "#123;" / "#x1F;" (semicolon optional)
    val digits0 = body.drop(1).stripSuffix(";")
    val hex = digits0.nonEmpty && (digits0.charAt(0) == 'x' || digits0.charAt(0) == 'X')
    val digits = if (hex) digits0.drop(1) else digits0
    if (digits.isEmpty) return "&" + body // not actually matched by the regex
    // Python has bigints; anything beyond 7 digits is already > 0x10FFFF
    val num =
      if (digits.length > 7) Int.MaxValue
      else Integer.parseInt(digits, if (hex) 16 else 10)
    invalidCharrefs.get(num) match {
      case Some(v) => v
      case None =>
        if (num >= 0xd800 && num <= 0xdfff) "�"
        else if (num > 0x10ffff) "�"
        else if (isInvalidCodepoint(num)) ""
        else new String(Character.toChars(num))
    }
  }

  private def decodeNamed(name: String): String =
    html5Entities.get(name) match {
      case Some(v) => v
      case None =>
        // longest prefix of length >= 2 (stdlib html.unescape)
        var x = name.length - 1
        while (x > 1) {
          html5Entities.get(name.substring(0, x)) match {
            case Some(v) => return v + name.substring(x)
            case None => x -= 1
          }
        }
        "&" + name
    }

  /** Python `html.unescape`, exactly. */
  def unescape(s: String): String = {
    if (!s.contains('&')) return s
    val m = CharrefPattern.matcher(s)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(s, last, m.start())
      val body = m.group(1)
      sb.append(if (body.charAt(0) == '#') decodeNumeric(body) else decodeNamed(body))
      last = m.end()
    }
    sb.append(s, last, s.length)
    sb.toString
  }

  // -------------------------------------------------------- tokenizer
  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** Scan a start tag from `lt` (pointing at '<'); honors quoted
    * attribute values containing '>'. Returns (tagName, selfClosing,
    * indexAfterTag) or None when the tag never closes (stdlib: the
    * rest of the document is then unconsumed tag text — emitted as
    * data at EOF; we mirror by treating it as text).
    */
  private def scanStartTag(s: String, lt: Int): Option[(String, Boolean, Int)] = {
    var i = lt + 1
    val nameStart = i
    while (i < s.length && (isAsciiLetter(s.charAt(i)) || s.charAt(i).isDigit ||
      "-.:_".indexOf(s.charAt(i)) >= 0)) i += 1
    val name = s.substring(nameStart, i).toLowerCase
    var quote: Char = 0
    var lastNonWs: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == quote) quote = 0
      } else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return Some((name, lastNonWs == '/', i + 1))
      if (!c.isWhitespace) lastNonWs = c
      i += 1
    }
    None
  }

  /** BeautifulSoup-equivalent visible text of an HTML document. */
  def getText(html: String): String = {
    val out = new StringBuilder
    val n = html.length
    var i = 0
    var templateDepth = 0
    def emit(start: Int, end: Int): Unit =
      if (end > start && templateDepth == 0)
        out.append(unescape(html.substring(start, end)))
    var textStart = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c != '<') { i += 1 }
      else {
        val rest = n - i
        if (rest >= 2 && html.charAt(i + 1) == '/') {
          // end tag (or bogus comment when not followed by a letter)
          emit(textStart, i)
          val gt = html.indexOf('>', i)
          if (gt < 0) { textStart = i; i = n } // unterminated: tail is data
          else {
            val name = html.substring(i + 2, gt).trim.toLowerCase
              .takeWhile(ch => isAsciiLetter(ch) || ch.isDigit || "-.:_".indexOf(ch) >= 0)
            if (name == "template" && templateDepth > 0) templateDepth -= 1
            i = gt + 1
            textStart = i
          }
        } else if (rest >= 4 && html.startsWith("<!--", i)) {
          emit(textStart, i)
          val end = html.indexOf("-->", i + 4)
          // stdlib EOF behavior: an unterminated construct is emitted
          // as DATA (goahead flushes rawdata[i:n] through unescape)
          if (end < 0) { textStart = i; i = n }
          else { i = end + 3; textStart = i }
        } else if (rest >= 2 && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          emit(textStart, i)
          // marked sections (<![...]>) run to ']>'; other declarations,
          // doctypes, bogus comments and PIs run to '>'
          val close =
            if (html.startsWith("<![", i)) {
              val end = html.indexOf("]>", i + 3)
              if (end < 0) -1 else end + 2
            } else {
              val gt = html.indexOf('>', i)
              if (gt < 0) -1 else gt + 1
            }
          if (close < 0) { textStart = i; i = n } // unterminated: data
          else { i = close; textStart = i }
        } else if (rest >= 2 && isAsciiLetter(html.charAt(i + 1))) {
          emit(textStart, i)
          scanStartTag(html, i) match {
            case None => // unterminated tag: stdlib leaves it as data
              textStart = i
              i = n
            case Some((name, selfClosing, after)) =>
              i = after
              if (!selfClosing && (name == "script" || name == "style")) {
                // CDATA mode: content (never decoded, typed Script/
                // Stylesheet by bs4) runs to the matching '</name'
                val m = java.util.regex.Pattern
                  .compile("(?i)</\\s*" + name)
                  .matcher(html)
                if (m.find(i)) {
                  val gt = html.indexOf('>', m.start())
                  i = if (gt < 0) n else gt + 1
                } else i = n
              } else if (!selfClosing && name == "template") {
                templateDepth += 1
              }
              textStart = i
          }
        } else {
          i += 1 // literal '<'
        }
      }
    }
    emit(textStart, i)
    out.toString
  }

  // ------------------------------------- reference post-pipeline (S5)
  private def pyIsSpace(c: Char): Boolean =
    Character.isWhitespace(c) ||
      Character.getType(c) == Character.SPACE_SEPARATOR || c == '\u0085'

  private def pyStrip(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && pyIsSpace(s.charAt(a))) a += 1
    while (b > a && pyIsSpace(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  private def pyRstrip(s: String): String = {
    var b = s.length
    while (b > 0 && pyIsSpace(s.charAt(b - 1))) b -= 1
    s.substring(0, b)
  }

  /** reader.py:461-466, in the reference's exact order:
    * `get_text().strip()` → collapse runs of ≥3 newlines to 2 →
    * per-line rstrip → join. (Order matters: lines holding only
    * spaces do NOT merge in the squeeze step, because the rstrip
    * happens after.)
    */
  def htmlToText(html: String): String = {
    val stripped = pyStrip(getText(html))
    val squeezed = stripped.replaceAll("\n\n+\n", "\n\n")
    graft.core.PyText.splitLines(squeezed).map(pyRstrip).mkString("\n")
  }

  // ------------------------- fetch-navigation helpers (Debian paths)
  /** Alias kept for the Debian readers: bs4 `get_text` equivalent. */
  def text(html: String): String = getText(html)

  /** Remove non-nested `<tag class="cls">…</tag>` blocks — the
    * reference's `soup.find_all(tag, class_=cls) → x.clear()`
    * (reader.py:564-575) for the BTS page shapes.
    */
  def removeTagged(html: String, tag: String, cls: String): String =
    html.replaceAll(
      s"""(?is)<$tag[^>]*class="[^"]*$cls[^"]*"[^>]*>.*?</$tag>""", "")

  def hrefs(html: String): Seq[String] =
    """(?i)<a\s[^>]*href="([^"]*)"""".r
      .findAllMatchIn(html).map(_.group(1)).toSeq

  /** href of the first anchor whose text equals `txt`. */
  def linkWithText(html: String, txt: String): Option[String] =
    s"""(?is)<a\\s[^>]*href="([^"]*)"[^>]*>\\s*${java.util.regex.Pattern.quote(txt)}\\s*</a>""".r
      .findFirstMatchIn(html).map(_.group(1))
}
