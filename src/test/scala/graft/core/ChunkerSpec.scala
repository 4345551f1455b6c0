package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference chunker fixtures (tests/test_reader.py:27-36,
  * 469-488) plus partition/order/budget properties over seeded random
  * inputs.
  */
class ChunkerSpec extends AnyFunSuite {

  test("FIXTURES.md §2 input A: 'a\\nb\\nc\\nd\\ne' maxBytes=2 → 5 chunks") {
    val chunks = Chunker.chunkContent("a\nb\nc\nd\ne", 2)
    assert(chunks.length == 5)
    assert(chunks.map(_._3) == Vector("a", "b", "c", "d", "e"))
    assert(chunks.map(c => (c._1, c._2)) ==
      Vector((0, 1), (1, 2), (2, 3), (3, 4), (4, 5)))
  }

  test("FIXTURES.md §2 input B: ['test']×6 budgets 15/5/1 → 2/6/6 chunks") {
    val content = Array.fill(6)("test").mkString("\n")
    assert(Chunker.chunkContent(content, 15).length == 2)
    assert(Chunker.chunkContent(content, 5).length == 6)
    assert(Chunker.chunkContent(content, 1).length == 6)
  }

  test("negative budget = no chunking (reader.py:1128-1129)") {
    val chunks = Chunker.chunkContent("a\nb\nc", -1)
    assert(chunks == Vector((0, 3, "a\nb\nc")))
  }

  test("empty content is one empty chunk (''.split('\\n') == [''])") {
    val chunks = Chunker.chunkContent("", 10)
    assert(chunks == Vector((0, 1, "")))
  }

  test("ranges partition [0, nLines) in order; budget respected unless single line") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val lines = IndexedSeq.fill(1 + rnd.nextInt(60))(
        "x" * rnd.nextInt(40))
      val budget = 1 + rnd.nextInt(200)
      val ranges = Chunker.chunkRanges(lines, budget)
      assert(ranges.head._1 == 0)
      assert(ranges.last._2 == lines.length)
      ranges.sliding(2).foreach {
        case Vector((_, e1), (s2, _)) => assert(e1 == s2)
        case _ =>
      }
      ranges.foreach { case (s, e) =>
        val bytes = PyText.utf8Len(lines.slice(s, e).mkString("\n"))
        assert(bytes <= budget || e - s == 1)
      }
    }
  }

  test("utf8Len equals getBytes length incl. multibyte and surrogates") {
    val samples = Seq("", "ascii", "héllo wörld", "中文文本处理", "🎉🎊 emoji",
      "mixed 中文 and 🎉 and ascii", "\n\t\r", "ñáéíóú")
    samples.foreach(s =>
      assert(PyText.utf8Len(s) == s.getBytes("UTF-8").length.toLong, s))
  }

  test("matches goldens from the reference's executed chunk_lines (multi-byte corpus)") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(getClass.getResourceAsStream("/golden/chunker.json"))
    val cases = root.get("cases")
    assert(cases.size() == 60)
    (0 until cases.size()).foreach { i =>
      val c = cases.get(i)
      val content = c.get("content").asText()
      val budget = c.get("budget").asLong()
      val want = (0 until c.get("ranges").size()).map { j =>
        val r = c.get("ranges").get(j)
        (r.get(0).asInt(), r.get(1).asInt())
      }
      val got = Chunker.chunkRanges(
        scala.collection.immutable.ArraySeq.unsafeWrapArray(
          PyText.splitLines(content)), budget)
      assert(got.sorted == want.sorted, s"case $i budget=$budget")
    }
  }

  test("recursive bisection matches a direct port on random inputs") {
    // direct (byte-recomputing) port of reader.py:1035-1071
    def reference(lines: IndexedSeq[String], maxBytes: Long,
                  s: Int, e: Int): Vector[(Int, Int)] = {
      val bytes = lines.slice(s, e).mkString("\n").getBytes("UTF-8").length
      if (bytes <= maxBytes || e - s == 1) Vector((s, e))
      else {
        val m = (s + e) / 2
        reference(lines, maxBytes, s, m) ++ reference(lines, maxBytes, m, e)
      }
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      val lines = IndexedSeq.fill(1 + rnd.nextInt(30))(
        ("中" * rnd.nextInt(5)) + ("y" * rnd.nextInt(10)))
      val budget = 1 + rnd.nextInt(80)
      assert(Chunker.chunkRanges(lines, budget) ==
        reference(lines, budget, 0, lines.length))
    }
  }
}
