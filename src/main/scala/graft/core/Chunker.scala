package graft.core

import scala.collection.immutable.ArraySeq

/** Deterministic recursive-bisection chunker.
  *
  * Reproduces the reference's `chunk_lines`
  * (reference reader.py:1035-1071) exactly: a line range `[start, end)`
  * is emitted whole when the UTF-8 byte length of
  * `'\n'.join(lines[start:end])` fits `maxBytes` OR the range is a
  * single line; otherwise it splits at `(start + end) / 2` and recurses.
  * The reference's recursive and stack-based variants produce the same
  * range set (tests/test_reader.py:469-488); canonical order here is
  * ascending `start`, which equals the recursive variant's insertion
  * order.
  *
  * Byte lengths are O(1) per range via a prefix-sum of per-line UTF-8
  * lengths, so chunking a document is O(lines + ranges·log lines)
  * rather than the reference's O(bytes·log lines) re-joins — same
  * output, scale-friendly (this runs per document inside `flatMap`).
  */
object Chunker {

  /** Line ranges `[start, end)` of the chunks of `lines`. */
  def chunkRanges(lines: IndexedSeq[String], maxBytes: Long): Vector[(Int, Int)] = {
    val n = lines.length
    val prefix = new Array[Long](n + 1)
    var i = 0
    while (i < n) { prefix(i + 1) = prefix(i) + PyText.utf8Len(lines(i)); i += 1 }
    // '\n'.join(lines[s:e]) byte length: line bytes + (e-s-1) separators
    def bytes(s: Int, e: Int): Long =
      if (e <= s) 0L else prefix(e) - prefix(s) + (e - s - 1)
    val out = Vector.newBuilder[(Int, Int)]
    def go(s: Int, e: Int): Unit =
      if (bytes(s, e) <= maxBytes || e - s == 1) out += ((s, e))
      else { val m = (s + e) / 2; go(s, m); go(m, e) }
    go(0, n)
    out.result()
  }

  /** Chunk a document's content. Mirrors `chunk_entry`
    * (reference reader.py:1118-1136): negative `maxBytes` means no
    * chunking (the whole content as one chunk spanning all lines).
    * Returns `(start, end, content)` with `content =
    * lines[start:end].mkString("\n")`.
    */
  def chunkContent(content: String, maxBytes: Long): Vector[(Int, Int, String)] = {
    val lines = ArraySeq.unsafeWrapArray(PyText.splitLines(content))
    if (maxBytes < 0) Vector((0, lines.length, content))
    else chunkRanges(lines, maxBytes).map { case (s, e) =>
      (s, e, lines.slice(s, e).mkString("\n"))
    }
  }

}
