package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Byte parity with the stdlib `html.parser` tokenizer + bs4 get_text
  * typing rules + the reference's post-pipeline (reader.py:461-466),
  * over the fixture corpus in golden/html_text.json
  * (tools/gen_html_golden.py).
  */
class HtmlTextSpec extends AnyFunSuite {

  private lazy val goldens: Map[String, (String, String)] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/html_text.json"), "UTF-8")
    val text = try src.mkString finally src.close()
    // flat {name: {"html":…, "text":…}} object — read with the
    // Jackson bundled in Spark's jars
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(text)
    val it = root.fields()
    var out = Map.empty[String, (String, String)]
    while (it.hasNext) {
      val e = it.next()
      out += e.getKey -> (e.getValue.get("html").asText(),
        e.getValue.get("text").asText())
    }
    out
  }

  test("all fixture documents match the stdlib-executed golden") {
    assert(goldens.nonEmpty)
    goldens.foreach { case (name, (html, want)) =>
      val got = HtmlText.htmlToText(html)
      assert(got == want, s"case $name:\n got=${got}\nwant=${want}")
    }
  }

  test("unescape: numeric edge cases follow html.unescape") {
    assert(HtmlText.unescape("&#65;&#x42;") == "AB")
    assert(HtmlText.unescape("&#0;") == "�")        // NUL -> FFFD
    assert(HtmlText.unescape("&#x80;") == "€")      // cp1252 remap
    assert(HtmlText.unescape("&#xD800;") == "�")    // surrogate
    assert(HtmlText.unescape("&#1114112;") == "�")  // > 0x10FFFF
    assert(HtmlText.unescape("&#xFDD0;") == "")          // noncharacter
    assert(HtmlText.unescape("&#999999999999;") == "�")
  }

  test("unescape: legacy no-semicolon forms longest-prefix match") {
    assert(HtmlText.unescape("&ampstop") == "&stop")
    assert(HtmlText.unescape("&notareal;") == "¬areal;")
    assert(HtmlText.unescape("&notin;") == "∉")
    assert(HtmlText.unescape("&unknown;") == "&unknown;")
  }

  test("urlContent routes HTML through the fidelity pipeline") {
    val html = "<html><body><script>no</script><p>Hi &amp; bye</p></body></html>"
    assert(SourceRegistry.urlContent(html) == "Hi & bye")
    assert(SourceRegistry.urlContent("plain text") == "plain text")
  }
}
