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
  * Stream selection follows pypdf's page walk where the document
  * structure allows it: objects are indexed, /Type /Page dictionaries'
  * /Contents references are resolved (array or single ref) in document
  * order, and `Do` operators descend into the page's /Resources
  * /XObject forms (cycle-guarded) — so a Form XObject's text appears
  * once per DRAW, like pypdf, rather than once per stream, and
  * appearance streams no page references contribute nothing. Documents
  * where no /Page yields text (odd generations, object-stream xrefs,
  * nonstandard structure) fall back to the previous behavior: text
  * from EVERY stream that looks like a content stream.
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
    extractByPages(raw, bytes).orElse(extractEveryStream(raw, bytes))
  }

  // ------------------------------------------------- page-tree walk --
  /** An indexed object: its dictionary text and, when it carries a
    * stream, the decoded-payload byte range.
    */
  private final case class PdfObj(dict: String, dataStart: Int, dataEnd: Int) {
    def hasStream: Boolean = dataStart >= 0
  }

  private val ObjHeader = java.util.regex.Pattern
    .compile("""(\d+)\s+(\d+)\s+obj\b""")

  /** Index every `N G obj` in document order. Later definitions of the
    * same object number win (incremental updates append re-definitions
    * and the live one is the last). The scan resumes AFTER each
    * object's `endstream`/`endobj`, never inside a stream payload —
    * compressed bytes that happen to spell `N G obj` would otherwise
    * shadow a real page/contents object and silently redirect the
    * page walk (wrong or truncated text with no fallback).
    */
  private def parseObjects(raw: String): (Map[Int, PdfObj], Seq[Int]) = {
    val objs = scala.collection.mutable.LinkedHashMap.empty[Int, PdfObj]
    val m = ObjHeader.matcher(raw)
    var from = 0
    while (from < raw.length && m.find(from)) {
      val num = try m.group(1).toInt catch { case _: Exception => -1 }
      val bodyStart = m.end()
      var resume = bodyStart
      if (num >= 0) {
        val endobj = raw.indexOf("endobj", bodyStart)
        val bodyEnd = if (endobj < 0) raw.length else endobj
        resume = if (endobj < 0) raw.length else endobj + "endobj".length
        val kw = nextStreamKeyword(raw, bodyStart)
        if (kw >= 0 && kw < bodyEnd) {
          var ds = kw + "stream".length
          if (ds < raw.length && raw.charAt(ds) == '\r') ds += 1
          if (ds < raw.length && raw.charAt(ds) == '\n') ds += 1
          val end = raw.indexOf("endstream", ds)
          var de = if (end < 0) -1 else end
          if (de > ds && raw.charAt(de - 1) == '\n') de -= 1
          if (de > ds && raw.charAt(de - 1) == '\r') de -= 1
          if (de >= ds) {
            objs(num) = PdfObj(raw.substring(bodyStart, kw), ds, de)
            // the payload may contain `endobj` bytes too — resume
            // after the real endstream, not an in-payload endobj
            resume = end + "endstream".length
          } else objs(num) = PdfObj(raw.substring(bodyStart, bodyEnd), -1, -1)
        } else {
          objs(num) = PdfObj(raw.substring(bodyStart, bodyEnd), -1, -1)
        }
      }
      from = math.max(resume, bodyStart)
    }
    (objs.toMap, objs.keys.toSeq)
  }

  /** Decode an object's stream payload per its dict's filters; None for
    * exotic filters, object streams, or corrupt deflate data.
    */
  private def decodeStream(bytes: Array[Byte], o: PdfObj): Option[String] = {
    if (!o.hasStream || ExoticFilters.exists(o.dict.contains) ||
      o.dict.contains("/ObjStm")) return None
    val data =
      if (o.dict.contains("/FlateDecode"))
        inflate(bytes, o.dataStart, o.dataEnd - o.dataStart)
      else Some(java.util.Arrays.copyOfRange(bytes, o.dataStart, o.dataEnd))
    data.map(new String(_, "ISO-8859-1"))
  }

  private val Ref = java.util.regex.Pattern.compile("""(\d+)\s+\d+\s+R""")

  /** Object numbers referenced by the value following `key` in `dict`:
    * a single `N G R` or an array of them. Nil when the key is absent
    * or its value carries no reference.
    */
  private def refsAfter(dict: String, key: String): Seq[Int] = {
    val at = dict.indexOf(key)
    if (at < 0) return Nil
    var i = at + key.length
    while (i < dict.length && Character.isWhitespace(dict.charAt(i))) i += 1
    if (i >= dict.length) return Nil
    val value =
      if (dict.charAt(i) == '[') {
        val close = dict.indexOf(']', i)
        dict.substring(i, if (close < 0) dict.length else close)
      } else dict.substring(i, math.min(dict.length, i + 32))
    val m = Ref.matcher(value)
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (dict.charAt(i) == '[') {
      while (m.find()) out += m.group(1).toInt
    } else if (m.find() && m.start() == 0) out += m.group(1).toInt
    out.toSeq
  }

  /** The balanced `<< ... >>` dictionary following `key` in `dict`, or
    * the dict of the object `key`'s value references. None otherwise.
    */
  private def dictAfter(dict: String, key: String,
                        objs: Map[Int, PdfObj]): Option[String] = {
    val at = dict.indexOf(key)
    if (at < 0) return None
    var i = at + key.length
    while (i < dict.length && Character.isWhitespace(dict.charAt(i))) i += 1
    if (i + 1 < dict.length && dict.charAt(i) == '<' && dict.charAt(i + 1) == '<') {
      var depth = 0
      var j = i
      while (j + 1 < dict.length) {
        if (dict.charAt(j) == '<' && dict.charAt(j + 1) == '<') { depth += 1; j += 2 }
        else if (dict.charAt(j) == '>' && dict.charAt(j + 1) == '>') {
          depth -= 1; j += 2
          if (depth == 0) return Some(dict.substring(i, j))
        } else j += 1
      }
      Some(dict.substring(i))
    } else refsAfter(dict, key).headOption.flatMap(objs.get).map(_.dict)
  }

  /** Name → object number pairs of an /XObject resource dictionary. */
  private def xobjectMap(pageDict: String,
                         objs: Map[Int, PdfObj]): Map[String, Int] =
    dictAfter(pageDict, "/Resources", objs)
      .flatMap(res => dictAfter(res, "/XObject", objs)) match {
      case None => Map.empty
      case Some(xd) =>
        val m = java.util.regex.Pattern
          .compile("""/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R""").matcher(xd)
        val out = scala.collection.mutable.Map.empty[String, Int]
        while (m.find()) out(m.group(1)) = m.group(2).toInt
        out.toMap
    }

  private val PageType = java.util.regex.Pattern
    .compile("""/Type\s*/Page(?![a-zA-Z])""")

  /** pypdf-shaped extraction: walk /Type /Page objects in document
    * order, decode each page's /Contents streams, descend into Form
    * XObjects on `Do` (so shared forms contribute once per draw).
    * None when no page yields text — caller falls back to the
    * every-stream scan.
    */
  private def extractByPages(raw: String, bytes: Array[Byte]): Option[String] = {
    val (objs, order) = parseObjects(raw)
    val pageNums = order.filter(n => PageType.matcher(objs(n).dict).find())
    if (pageNums.isEmpty) return None

    def textOf(objNum: Int, xobjs: Map[String, Int],
               visiting: Set[Int]): Option[String] =
      if (visiting.contains(objNum)) None // cycle guard
      else objs.get(objNum).flatMap(o => decodeStream(bytes, o)).map { s =>
        streamText(s, name => xobjs.get(name).flatMap { xn =>
          // a form's own /Resources may rebind names; fall back to the
          // page's map when it has none
          val inner = objs.get(xn).map(x => xobjectMap(x.dict, objs))
            .filter(_.nonEmpty).getOrElse(xobjs)
          textOf(xn, inner, visiting + objNum)
        })
      }

    val pages = pageNums.flatMap { pn =>
      val pd = objs(pn).dict
      val xobjs = xobjectMap(pd, objs)
      val t = refsAfter(pd, "/Contents")
        .flatMap(cn => textOf(cn, xobjs, Set(pn)))
        .filter(_.nonEmpty)
      if (t.isEmpty) None else Some(t.mkString("\n"))
    }
    if (pages.isEmpty) None else Some(pages.mkString("\n"))
  }

  // ----------------------------------------- every-stream fallback --
  /** The previous behavior: text from every stream that scans like a
    * content stream, in document order — the safety net for documents
    * whose page tree this parser cannot resolve.
    */
  private def extractEveryStream(raw: String,
                                 bytes: Array[Byte]): Option[String] = {
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
            .map(streamText(_, _ => None))
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
    * non-text operators are skipped — except `Do`, which hands the
    * preceding name to `resolveXObject` and inlines whatever text the
    * drawn Form XObject produces (pypdf's behavior; the every-stream
    * fallback passes a no-op resolver).
    */
  private def streamText(s: String,
                         resolveXObject: String => Option[String]): String = {
    val out = new java.lang.StringBuilder
    val pending = new java.lang.StringBuilder
    var lastName = ""
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
          val n0 = i
          while (i < n && !" \t\r\n\f()<>[]{}/%".contains(s.charAt(i))) i += 1
          lastName = s.substring(n0, i)
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
            case "Do" =>
              resolveXObject(lastName).filter(_.nonEmpty).foreach { t =>
                newline(); out.append(t); newline()
              }
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
