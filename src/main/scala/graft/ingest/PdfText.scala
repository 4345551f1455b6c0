package graft.ingest

import java.util.zip.{DataFormatException, Inflater}

/** Pure-JVM text extraction for simple PDFs — the real implementation
  * behind the S2 seam (reference `reader.py:310-333` runs pypdf's
  * `page.extract_text()`; no PDF library ships in this build
  * environment, but the common case — unencrypted documents whose
  * content streams are plain or FlateDecode — is fully parseable from
  * the spec with `java.util.zip.Inflater` plus a content-stream token
  * scanner).
  *
  * Scope, by design:
  *  - handled: uncompressed and /FlateDecode content streams, literal
  *    `(...)` strings (all escape forms: \n \r \t \b \f \( \) \\,
  *    octal, line continuation, nested parens), `<hex>` strings, the
  *    text-showing operators Tj ' " TJ, and the line-advancing
  *    operators Td TD T* (each emits a newline);
  *  - refused (returns None, caller falls back / raises): encrypted
  *    documents (/Encrypt), and documents with NO extractable text —
  *    e.g. all content behind LZW/DCT/JBIG2/object-stream encodings.
  *    Exotic streams inside an otherwise-simple document are skipped,
  *    not fatal.
  *
  * Glyph decoding is PDFDocEncoding-as-Latin-1 — correct for the
  * ASCII/WinAnsi simple documents this targets; custom font CMaps
  * (/ToUnicode) are out of scope and such text may come out garbled,
  * exactly like pypdf on fonts with no unicode map.
  *
  * One further scope note: text is taken from EVERY stream that looks
  * like a content stream, not just streams referenced from a /Page's
  * /Contents — so Form XObjects and annotation appearance streams
  * contribute too, and text drawn via an XObject a page also inlines
  * can appear twice. pypdf walks the page tree instead; for the simple
  * single-generation documents this targets the two agree, and a
  * stricter version would resolve /Page /Contents references first.
  */
object PdfText {

  /** Filters that need codecs we don't ship: a stream whose dict names
    * any of these is skipped. (FlateDecode is handled; everything else
    * is image/legacy territory.)
    */
  private val ExoticFilters = Seq("/ASCIIHexDecode", "/ASCII85Decode",
    "/LZWDecode", "/RunLengthDecode", "/CCITTFaxDecode", "/JBIG2Decode",
    "/DCTDecode", "/JPXDecode", "/Crypt")

  def extract(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 5) return None
    // Latin-1 is byte-preserving: string indexes == byte offsets, so
    // the keyword scan and the binary slicing share one coordinate
    // system.
    val raw = new String(bytes, "ISO-8859-1")
    if (!raw.startsWith("%PDF-")) return None
    if (isEncrypted(raw)) return None
    val pages = scala.collection.mutable.ArrayBuffer.empty[String]
    var from = 0
    var next = nextStreamKeyword(raw, from)
    while (next >= 0) {
      val kw = next
      val dictStart = raw.lastIndexOf(" obj", kw) max 0
      val dict = raw.substring(dictStart, kw)
      // data begins after "stream" + EOL (spec: CRLF or LF)
      var ds = kw + "stream".length
      if (ds < raw.length && raw.charAt(ds) == '\r') ds += 1
      if (ds < raw.length && raw.charAt(ds) == '\n') ds += 1
      val end = raw.indexOf("endstream", ds)
      if (end < 0) { next = -1 }
      else {
        var de = end
        if (de > ds && raw.charAt(de - 1) == '\n') de -= 1
        if (de > ds && raw.charAt(de - 1) == '\r') de -= 1
        if (!ExoticFilters.exists(dict.contains) &&
          !dict.contains("/ObjStm")) {
          val data: Option[Array[Byte]] =
            if (dict.contains("/FlateDecode"))
              inflate(bytes, ds, de - ds)
            else Some(java.util.Arrays.copyOfRange(bytes, ds, de))
          data.map(new String(_, "ISO-8859-1"))
            .filter(looksLikeContentStream)
            .map(streamText)
            .filter(_.nonEmpty)
            .foreach(pages += _)
        }
        from = end + "endstream".length
        next = nextStreamKeyword(raw, from)
      }
    }
    if (pages.isEmpty) None else Some(pages.mkString("\n"))
  }

  /** Encryption is declared by an /Encrypt key in the trailer
    * dictionary (or, for cross-reference-stream PDFs, in the /XRef
    * stream's dictionary) — never by the literal byte sequence
    * "/Encrypt" appearing elsewhere, e.g. inside a content-stream
    * string. Scanning the whole file for it (the first cut of this
    * check) refused such innocent documents; this anchors the check to
    * the dictionaries that can actually carry the key.
    */
  private def isEncrypted(raw: String): Boolean = {
    // Classic form: `trailer << ... /Encrypt n g R ... >>`. A file may
    // hold several trailers (incremental updates); any declaring
    // /Encrypt means the document needs the security handler.
    // Window bounds run to the NEXT structural terminator — a small
    // fixed window could stop short of a late /Encrypt key (large
    // /ID//Info strings first) — but stay capped at 16 KiB: in a
    // terminator-less (truncated/corrupt) file an unbounded window
    // would reintroduce the whole-file false positive this check
    // exists to avoid (a content stream merely *mentioning*
    // "/Encrypt"), and real trailer dictionaries are far smaller.
    def firstAfter(from: Int, kws: String*): Int = {
      val hits = kws.map(raw.indexOf(_, from)).filter(_ >= 0)
      val stop = if (hits.isEmpty) raw.length else hits.min
      math.min(stop, from + 16384)
    }
    var t = raw.indexOf("trailer")
    while (t >= 0) {
      val open = raw.indexOf("<<", t)
      if (open >= 0) {
        val stop = firstAfter(open, "startxref", "%%EOF")
        if (raw.substring(open, stop).contains("/Encrypt")) return true
      }
      t = raw.indexOf("trailer", t + 7)
    }
    // XRef-stream form (PDF 1.5+, no `trailer` keyword): the stream
    // dictionary of each `/Type /XRef` object doubles as the trailer.
    var x = raw.indexOf("/XRef")
    while (x >= 0) {
      // clamp the backward scan too: with no " obj" before the hit the
      // window would otherwise start at offset 0 — a content stream
      // mentioning both "/XRef" and "/Encrypt" earlier in the file
      // would re-trigger the whole-file false positive
      val objStart = math.max(raw.lastIndexOf(" obj", x), x - 16384) max 0
      val stop = firstAfter(x, "stream", "endobj")
      if (raw.substring(objStart, stop).contains("/Encrypt")) return true
      x = raw.indexOf("/XRef", x + 5)
    }
    false
  }

  /** Next occurrence of the `stream` KEYWORD — token-boundary checked,
    * so the tail of `endstream` never matches.
    */
  private def nextStreamKeyword(raw: String, from: Int): Int = {
    var i = raw.indexOf("stream", from)
    while (i > 0 && Character.isLetter(raw.charAt(i - 1))) {
      i = raw.indexOf("stream", i + 1)
    }
    i
  }

  private def inflate(b: Array[Byte], off: Int, len: Int): Option[Array[Byte]] = {
    if (len <= 0) return None
    val inf = new Inflater()
    inf.setInput(b, off, len)
    val out = new java.io.ByteArrayOutputStream(len * 4)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return None // stuck: not a zlib stream
        out.write(buf, 0, n)
      }
      // Input drained but the stream never reached its end marker:
      // truncated/corrupt deflate data. Refuse rather than hand back
      // garbled partial text as if it decoded cleanly.
      if (inf.finished()) Some(out.toByteArray) else None
    } catch {
      case _: DataFormatException => None
    } finally inf.end()
  }

  private def looksLikeContentStream(s: String): Boolean =
    s.contains("BT") &&
      (s.contains("Tj") || s.contains("TJ") || s.contains("'"))

  /** Token scan of one decoded content stream: strings accumulate into
    * a pending buffer that the next text-showing operator flushes;
    * line-advance operators emit newlines. Numbers, names, and
    * non-text operators are skipped.
    */
  private def streamText(s: String): String = {
    val out = new java.lang.StringBuilder
    val pending = new java.lang.StringBuilder
    def newline(): Unit =
      if (out.length() > 0 && out.charAt(out.length() - 1) != '\n')
        out.append('\n')
    var i = 0
    val n = s.length
    while (i < n) {
      s.charAt(i) match {
        case '(' =>
          i = literalString(s, i, pending)
        case '<' if i + 1 < n && s.charAt(i + 1) != '<' =>
          i = hexString(s, i, pending)
        case '%' => // comment to end of line
          while (i < n && s.charAt(i) != '\n' && s.charAt(i) != '\r') i += 1
        case '/' => // name token: consume so /Tj-style names can't
          // masquerade as operators
          i += 1
          while (i < n && !" \t\r\n\f()<>[]{}/%".contains(s.charAt(i))) i += 1
        case '\'' =>
          newline(); out.append(pending); pending.setLength(0); i += 1
        case '"' =>
          newline(); out.append(pending); pending.setLength(0); i += 1
        case c if Character.isLetter(c) || c == '*' =>
          val t0 = i
          while (i < n && (Character.isLetter(s.charAt(i)) || s.charAt(i) == '*'))
            i += 1
          s.substring(t0, i) match {
            case "Tj" | "TJ" =>
              out.append(pending); pending.setLength(0)
            case "Td" | "TD" => newline()
            case "T*" => newline()
            case "ET" => newline()
            case _ => () // BT, Tf, Tm, re, W, n, cm, ...: no text effect
          }
        case _ => i += 1
      }
    }
    out.toString
  }

  /** `(...)` literal string: handles nesting, escapes, octal, and
    * line-continuation. Returns the index after the closing paren.
    */
  private def literalString(s: String, start: Int,
                            out: java.lang.StringBuilder): Int = {
    var i = start + 1
    var depth = 1
    val n = s.length
    while (i < n && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < n =>
          s.charAt(i + 1) match {
            case 'n' => out.append('\n'); i += 2
            case 'r' => out.append('\r'); i += 2
            case 't' => out.append('\t'); i += 2
            case 'b' => out.append('\b'); i += 2
            case 'f' => out.append('\f'); i += 2
            case '(' => out.append('('); i += 2
            case ')' => out.append(')'); i += 2
            case '\\' => out.append('\\'); i += 2
            case '\r' => // continuation: swallow CR[LF]
              i += 2; if (i < n && s.charAt(i) == '\n') i += 1
            case '\n' => i += 2
            case d if d >= '0' && d <= '7' =>
              var v = 0
              var k = i + 1
              while (k < n && k < i + 4 && s.charAt(k) >= '0' && s.charAt(k) <= '7') {
                v = v * 8 + (s.charAt(k) - '0'); k += 1
              }
              out.append((v & 0xff).toChar)
              i = k
            case other => out.append(other); i += 2
          }
        case '(' => depth += 1; out.append('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) out.append(')')
          i += 1
        case c => out.append(c); i += 1
      }
    }
    i
  }

  /** `<hex>` string: whitespace-tolerant hex pairs, odd length padded
    * with 0 per spec. Returns the index after `>`.
    */
  private def hexString(s: String, start: Int,
                        out: java.lang.StringBuilder): Int = {
    var i = start + 1
    val n = s.length
    val hex = new java.lang.StringBuilder
    while (i < n && s.charAt(i) != '>') {
      val c = s.charAt(i)
      if (Character.digit(c, 16) >= 0) hex.append(c)
      i += 1
    }
    if (hex.length() % 2 == 1) hex.append('0')
    var k = 0
    while (k < hex.length()) { // even length after padding
      val v = Character.digit(hex.charAt(k), 16) * 16 +
        Character.digit(hex.charAt(k + 1), 16)
      out.append((v & 0xff).toChar)
      k += 2
    }
    if (i < n) i + 1 else i
  }
}
