package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S13: the sectioned-document index scan
  * (reference policy.py:23-123, `DebianPolicy`/`DebianDevref`):
  * a heading line followed by an underline of `***` (section), `===`
  * (subsection) or `---` (subsubsection); the index is the heading's
  * first word when it ends with '.'.
  *
  * Spark shape: a lines DataFrame with a `lag` window pairs each
  * underline with its heading; section extraction slices the line
  * range between consecutive same-level separators. The window is
  * unpartitioned by design — one document's line order is a single
  * sequence (documents are small; parallelism comes from processing
  * many documents, each its own partition).
  */
final class SectionedDoc(spark: SparkSession, content: String) {
  import spark.implicits._

  val SepSection = "***"
  val SepSubsection = "==="
  val SepSubsubsection = "---"

  /** Lines rstripped at load (policy.py:45). */
  private val lines: IndexedSeq[String] =
    graft.core.PyText.splitLines(content).map(_.replaceAll("\\s+$", "")).toIndexedSeq

  def linesDf: DataFrame =
    spark.createDataset(lines.zipWithIndex.map { case (l, i) => (i.toLong, l) })
      .toDF("idx", "line")

  private def sepLevel(c: org.apache.spark.sql.Column) =
    when(c.startsWith(SepSection), 1)
      .when(c.startsWith(SepSubsection), 2)
      .when(c.startsWith(SepSubsubsection), 3)

  /** The section index in document order (policy.py:65-79): previous
    * line's first word, kept when it ends with '.', trailing dots
    * stripped.
    */
  def scanIndexes(): Seq[String] = indexDf().orderBy("idx")
    .select("sectionId").as[String].collect().toSeq

  def indexDf(): DataFrame = {
    val w = Window.orderBy("idx")
    linesDf
      .withColumn("prev", lag($"line", 1).over(w))
      .withColumn("level", sepLevel($"line"))
      .where($"level".isNotNull && $"idx" > 0)
      .withColumn("firstWord", split($"prev", " ").getItem(0))
      .where($"firstWord".endsWith("."))
      .select($"idx", regexp_replace($"firstWord", "\\.+$", "").as("sectionId"),
        $"level", $"prev".as("heading"))
  }

  /** Extract one section by index (policy.py:85-118): from its heading
    * line up to (exclusive) the next same-level separator's heading.
    *
    * ONE job: every same-level separator row carries the next
    * separator's idx via `lead`, so the matching row alone determines
    * the `[start, end)` line range; the body then slices the local
    * line buffer (the frame was built from it). The previous
    * formulation collected three times per lookup.
    */
  def section(index: String): String = {
    val level = index.split("\\.").length
    val sep = Seq(SepSection, SepSubsection, SepSubsubsection)(level - 1)
    val w = Window.orderBy("idx")
    val hit = linesDf
      .withColumn("prev", lag($"line", 1).over(w))
      .where($"line".startsWith(sep))
      .withColumn("nextIdx", lead($"idx", 1).over(Window.orderBy("idx")))
      .where($"prev".startsWith(s"$index. "))
      .orderBy("idx").limit(1)
      .select($"idx", $"nextIdx")
      .collect().headOption
    hit match {
      case None => ""
      case Some(r) =>
        val sepIdx = r.getLong(0)
        // [heading, sep, body...] up to just before the next heading
        val endExcl =
          if (r.isNullAt(1)) lines.length.toLong else r.getLong(1) - 1L
        lines.slice((sepIdx - 1).toInt, endExcl.toInt).mkString("\n")
    }
  }

  def fullText: String = lines.mkString("\n")
}
