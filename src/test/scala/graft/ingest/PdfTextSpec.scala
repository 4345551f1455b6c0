package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM PDF text extraction: fixtures from tools/gen_pdf_fixture.py
  * (hand-assembled per the PDF 1.4 spec — uncompressed, FlateDecode,
  * and an /Encrypt-marked document).
  */
class PdfTextSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/pdf/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val WantLines = Seq(
    "Hello, PDF world!",
    "Split across TJ (array)",
    "Line with escapes: \\ ( ) and octal ABC",
    "Hex string",
    "apostrophe advances")

  test("uncompressed content stream: Tj, TJ arrays, escapes, hex, '") {
    val got = PdfText.extract(fixture("simple_plain.pdf"))
    assert(got.isDefined)
    assert(got.get.split("\n").toSeq == WantLines)
  }

  test("FlateDecode content stream inflates to the same text") {
    val plain = PdfText.extract(fixture("simple_plain.pdf"))
    val flate = PdfText.extract(fixture("simple_flate.pdf"))
    assert(flate == plain)
  }

  test("multi-page documents extract in page order (reader.py:328-332)") {
    val got = PdfText.extract(fixture("two_page.pdf")).get
    assert(got.contains("Page one text") && got.contains("Page two text"))
    assert(got.indexOf("Page one text") < got.indexOf("Page two text"))
  }

  test("encrypted documents refuse (None), never garbled output") {
    assert(PdfText.extract(fixture("encrypted.pdf")).isEmpty)
  }

  test("literal '/Encrypt' inside a content-stream string is NOT encryption") {
    // The encryption check is anchored to trailer / XRef-stream
    // dictionaries; this document merely *mentions* /Encrypt in its
    // visible text and must still extract.
    val doc = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Length 44 >>\nstream\n" +
      "BT (Docs about the /Encrypt key go here) Tj ET\n" +
      "endstream\nendobj\n" +
      "trailer\n<< /Size 2 /Root 1 0 R >>\nstartxref\n9\n%%EOF\n").getBytes
    val got = PdfText.extract(doc)
    assert(got.exists(_.contains("Docs about the /Encrypt key go here")))
  }

  test("far-apart '/Encrypt' and '/XRef' mentions before any object still extract") {
    // An "/XRef" hit with NO " obj" anywhere before it used to scan
    // its window from offset 0 — so an "/Encrypt" mention ANYWHERE
    // earlier (here: >16 KiB away, in header comments) re-triggered
    // the whole-file false positive. The backward scan is now clamped
    // to 16 KiB before the hit.
    val pad = "% filler comment line to push offsets apart\n" * 500 // ~22 KiB
    val doc = ("%PDF-1.5\n" +
      "% build notes: the /Encrypt key is never used by this tool\n" +
      pad +
      "% more notes: we emit classic tables, not /XRef streams\n" +
      "1 0 obj\n<< /Length 20 >>\nstream\nBT (kept text) Tj ET\nendstream\nendobj\n" +
      "trailer\n<< /Size 2 /Root 1 0 R >>\nstartxref\n9\n%%EOF\n").getBytes
    assert(PdfText.extract(doc).exists(_.contains("kept text")))
  }

  test("trailer-declared /Encrypt refuses even with extractable streams") {
    val doc = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Length 20 >>\nstream\nBT (secret) Tj ET\nendstream\nendobj\n" +
      "trailer\n<< /Size 2 /Root 1 0 R /Encrypt 9 0 R >>\nstartxref\n9\n%%EOF\n").getBytes
    assert(PdfText.extract(doc).isEmpty)
  }

  test("truncated FlateDecode stream refuses instead of emitting partial text") {
    // Compress a long content stream, then cut the deflate bytes short:
    // the inflater drains its input without reaching the end marker.
    // Partially-inflated text (which here still looks like a content
    // stream) must not be passed off as a clean extraction.
    val content = ("BT " + (1 to 60).map(i => s"(line $i) Tj T* ").mkString + "ET")
      .getBytes("ISO-8859-1")
    val defl = new java.util.zip.Deflater()
    defl.setInput(content); defl.finish()
    val buf = new Array[Byte](content.length * 2)
    val clen = defl.deflate(buf)
    defl.end()
    val cut = java.util.Arrays.copyOf(buf, clen / 2)
    val head = s"%PDF-1.4\n1 0 obj\n<< /Length ${cut.length} /Filter /FlateDecode >>\nstream\n"
      .getBytes("ISO-8859-1")
    val tail = "\nendstream\nendobj\n".getBytes("ISO-8859-1")
    val doc = head ++ cut ++ tail
    assert(PdfText.extract(doc).isEmpty)
    // sanity: the untruncated stream extracts fine
    val full = java.util.Arrays.copyOf(buf, clen)
    val okDoc = (s"%PDF-1.4\n1 0 obj\n<< /Length ${full.length} /Filter /FlateDecode >>\nstream\n"
      .getBytes("ISO-8859-1")) ++ full ++ tail
    assert(PdfText.extract(okDoc).exists(_.contains("line 60")))
  }

  test("shared Form XObject: once per draw, orphan appearance streams excluded") {
    // two pages share one Form XObject (/Fm0) and each draws it once;
    // an appearance-like stream (object 8) is referenced by NO page.
    // pypdf semantics: the form's text appears once per Do, the orphan
    // contributes nothing (the old every-stream scan extracted the
    // orphan and the form exactly once each, regardless of draws).
    def obj(n: Int, body: String) = s"$n 0 obj\n$body\nendobj\n"
    def streamObj(n: Int, dict: String, content: String) =
      s"$n 0 obj\n<< $dict /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n"
    val res = "/Resources << /XObject << /Fm0 7 0 R >> >>"
    val doc = ("%PDF-1.4\n" +
      obj(1, "<< /Type /Catalog /Pages 2 0 R >>") +
      obj(2, "<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>") +
      obj(3, s"<< /Type /Page /Parent 2 0 R /Contents 4 0 R $res >>") +
      streamObj(4, "", "BT (Page one body) Tj ET /Fm0 Do") +
      obj(5, s"<< /Type /Page /Parent 2 0 R /Contents 6 0 R $res >>") +
      streamObj(6, "", "BT (Page two body) Tj ET /Fm0 Do") +
      streamObj(7, "/Type /XObject /Subtype /Form", "BT (Shared footer) Tj ET") +
      streamObj(8, "", "BT (Orphan appearance text) Tj ET") +
      "trailer\n<< /Size 9 /Root 1 0 R >>\nstartxref\n9\n%%EOF\n").getBytes
    val got = PdfText.extract(doc).get
    assert(got.contains("Page one body") && got.contains("Page two body"))
    assert(!got.contains("Orphan appearance text"))
    assert(got.sliding("Shared footer".length).count(_ == "Shared footer") == 2,
      s"form text should appear once per draw:\n$got")
    // draw order: page 1 body, footer, page 2 body, footer
    assert(got.indexOf("Page one body") < got.indexOf("Shared footer"))
    assert(got.indexOf("Shared footer") < got.indexOf("Page two body"))
    assert(got.indexOf("Page two body") <
      got.lastIndexOf("Shared footer"))
  }

  test("object-header bytes inside a stream payload cannot shadow real objects") {
    // the content stream of object 4 contains the raw bytes
    // `5 0 obj ... endobj` — under a payload-blind scan that fake
    // definition wins ("later definitions win") and redirects the
    // page walk of the REAL object 5 (the second page), truncating
    // extraction. The scanner must resume after endstream instead.
    def obj(n: Int, body: String) = s"$n 0 obj\n$body\nendobj\n"
    def streamObj(n: Int, dict: String, content: String) =
      s"$n 0 obj\n<< $dict /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n"
    val trojan = "BT (Before) Tj ET\n" +
      "5 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n" +
      "BT (After) Tj ET"
    val doc = ("%PDF-1.4\n" +
      obj(1, "<< /Type /Catalog /Pages 2 0 R >>") +
      obj(2, "<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>") +
      obj(3, "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>") +
      streamObj(4, "", trojan) +
      obj(5, "<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>") +
      streamObj(6, "", "BT (Real page two) Tj ET") +
      "trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n9\n%%EOF\n").getBytes
    val got = PdfText.extract(doc).get
    assert(got.contains("Before") && got.contains("After"))
    assert(got.contains("Real page two"),
      s"payload bytes shadowed the real page object:\n$got")
  }

  test("XObject cycles and missing /Contents refs refuse gracefully") {
    // a form that draws itself must not loop; a page whose /Contents
    // points at a missing object falls back to the every-stream scan
    def streamObj(n: Int, dict: String, content: String) =
      s"$n 0 obj\n<< $dict /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n"
    val cyc = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Page /Contents 2 0 R " +
      "/Resources << /XObject << /F 3 0 R >> >> >>\nendobj\n" +
      streamObj(2, "", "BT (top) Tj ET /F Do") +
      streamObj(3, "/Type /XObject /Subtype /Form", "BT (inner) Tj ET /F Do") +
      "trailer\n<< /Size 4 /Root 1 0 R >>\n%%EOF\n").getBytes
    val got = PdfText.extract(cyc).get
    assert(got.contains("top") && got.contains("inner")) // one level, no loop
    val dangling = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Page /Contents 9 0 R >>\nendobj\n" +
      streamObj(2, "", "BT (fallback text) Tj ET") +
      "trailer\n<< /Size 3 /Root 1 0 R >>\n%%EOF\n").getBytes
    assert(PdfText.extract(dangling).exists(_.contains("fallback text")))
  }

  test("non-PDF and truncated inputs refuse") {
    assert(PdfText.extract(null).isEmpty)
    assert(PdfText.extract(Array[Byte]()).isEmpty)
    assert(PdfText.extract("not a pdf at all".getBytes).isEmpty)
    assert(PdfText.extract("%PDF-1.4 junk with no streams".getBytes).isEmpty)
    // stream keyword with no endstream: must not loop or throw
    assert(PdfText.extract(
      "%PDF-1.4\n1 0 obj\n<< >>\nstream\nBT (x) Tj".getBytes).isEmpty)
  }

  test("exotic filters are skipped, not fatal; plain streams still extract") {
    val doc = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Length 5 /Filter /DCTDecode >>\nstream\nBT(x)Tj\nendstream\nendobj\n" +
      "2 0 obj\n<< /Length 20 >>\nstream\nBT (kept text) Tj ET\nendstream\nendobj\n").getBytes
    assert(PdfText.extract(doc).exists(_.contains("kept text")))
  }

  test("fuzz: random garbage and mutated fixtures never throw") {
    val rnd = new scala.util.Random(20260812L)
    val base = fixture("simple_flate.pdf")
    (0 until 200).foreach { i =>
      val bytes =
        if (i % 2 == 0) { // pure garbage, sometimes with the magic
          val b = Array.fill[Byte](rnd.nextInt(400))(rnd.nextInt(256).toByte)
          if (i % 4 == 0 && b.length >= 5) "%PDF-".getBytes.copyToArray(b)
          b
        } else { // fixture with random mutations (truncation + flips)
          val cut = 1 + rnd.nextInt(base.length)
          val b = java.util.Arrays.copyOf(base, cut)
          (0 until 5).foreach { _ =>
            if (b.length > 0) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          }
          b
        }
      PdfText.extract(bytes) // Option out, no exceptions — total parser
    }
  }

  test("default registry binding extracts real PDFs (PureJvm)") {
    assert(PdfExtractor.PureJvm.extractText(fixture("simple_flate.pdf"))
      .contains("Hello, PDF world!"))
    val ex = intercept[UnsupportedOperationException](
      PdfExtractor.PureJvm.extractText(fixture("encrypted.pdf")))
    assert(ex.getMessage.contains("PdfExtractor"))
  }
}
