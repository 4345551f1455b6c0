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
    */
  def section(index: String): String = {
    val level = index.split("\\.").length
    val sep = Seq(SepSection, SepSubsection, SepSubsubsection)(level - 1)
    val w = Window.orderBy("idx")
    val seps = linesDf
      .withColumn("prev", lag($"line", 1).over(w))
      .where($"line".startsWith(sep))
      .select($"idx", $"prev")
    val start = seps.where($"prev".startsWith(s"$index. "))
      .orderBy("idx").limit(1).select($"idx").as[Long].collect().headOption
    start match {
      case None => ""
      case Some(sepIdx) =>
        val next = seps.where($"idx" > sepIdx).orderBy("idx").limit(1)
          .select($"idx").as[Long].collect().headOption
        // [heading, sep, body...] up to just before the next heading
        val endExcl = next.fold(lines.length.toLong)(_ - 1L)
        linesDf.where($"idx" >= sepIdx - 1 && $"idx" < endExcl)
          .orderBy("idx").select("line").as[String].collect().mkString("\n")
    }
  }

  def fullText: String = lines.mkString("\n")
}
