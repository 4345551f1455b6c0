package graft.streaming

import graft.SparkTestBase
import graft.pipeline.{Dedup, TextAnalysis, UrlFilter}
import org.apache.spark.sql.functions._

/** Curation on ingest equals the batch composition whatever the
  * batch boundaries: blocklist → quality gate → exact dedup.
  */
class StreamingCurationSpec extends SparkTestBase {

  private val bl = Seq("src3.example.com")

  private def decorated = spark.read
    .parquet(s"${sf()}/documents.parquet")
    .withColumn("url", concat(lit("https://"),
      when(col("doc_id") % 2 === 1, lit("cdn.")).otherwise(lit("")),
      col("source"), lit(".example.com/doc/"),
      col("doc_id").cast("string")))

  private def batchKept(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    Dedup.dropExactDups(
        UrlFilter.dropBlockedUrls(df, "url", bl)
          .where(TextAnalysis.qualityScore(col("text")) >= 0.3),
        "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq

  test("batched curation replays the batch composition") {
    val docs = decorated
    val want = batchKept(docs)
    val root = java.nio.file.Files.createTempDirectory("scur")
    val idx = root.resolve("index").toString
    val out = root.resolve("kept").toString
    Seq(0L -> 150L, 150L -> 300L, 300L -> 100000L).foreach {
      case (lo, hi) =>
        StreamingCuration.processBatch(spark,
          docs.where(col("doc_id") >= lo && col("doc_id") < hi),
          "text", "doc_id", "url", bl, minQuality = 0.3, idx, out)
    }
    val got = spark.read.parquet(out)
      .select("doc").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    // a fully-filtered batch (everything blocked) is a no-op
    StreamingCuration.processBatch(spark,
      docs.where(col("source") === "src3").limit(5),
      "text", "doc_id", "url", Seq("example.com"), 0.0, idx, out)
    assert(spark.read.parquet(out).count() == got.size.toLong)
  }

  test("watermarked curation quarantines stragglers and curates the rest") {
    val docs = decorated.withColumn("ts", timestamp_millis(
      (lit(1700000000L) + col("doc_id") -
        when(col("doc_id") % 17 === 5, lit(100000L)).otherwise(lit(0L)))
        * 1000L))
    val root = java.nio.file.Files.createTempDirectory("swcur")
    val idx = root.resolve("index").toString
    val out = root.resolve("kept").toString
    val late = root.resolve("late").toString
    val bounds = Seq(0L -> 150L, 150L -> 300L, 300L -> 100000L)
    bounds.zipWithIndex.foreach { case ((lo, hi), b) =>
      StreamingWatermarkedCuration.processBatch(spark,
        docs.where(col("doc_id") >= lo && col("doc_id") < hi),
        "text", "doc_id", "url", "ts", bl, minQuality = 0.3,
        delayMillis = 3600L * 1000L, runId = "runW", batchId = b.toLong,
        idx, out, late)
    }
    // late = the stragglers in batches >= 1 (batch 0 has no watermark)
    val wantLate = docs.where(col("doc_id") % 17 === 5 &&
        col("doc_id") >= 150L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val gotLate = spark.read.parquet(late)
      .select("doc").collect().map(_.getLong(0)).sorted.toSeq
    assert(gotLate == wantLate)
    assert(gotLate.nonEmpty, "fixture must actually produce stragglers")
    // every quarantined row records the watermark that rejected it
    val wmOk = spark.read.parquet(late)
      .where(col("event_ms") > col("late_wm_ms")).count()
    assert(wmOk == 0L)
    // kept = the batch composition over the ON-TIME corpus
    val want = batchKept(docs.where(!(col("doc_id") % 17 === 5 &&
      col("doc_id") >= 150L)))
    val got = spark.read.parquet(out)
      .select("doc").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
  }

}
