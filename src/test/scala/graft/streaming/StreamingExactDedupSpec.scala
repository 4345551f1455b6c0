package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Streaming exact dedup over the persisted DedupIndex: the kept set
  * equals the one-shot min-id-per-fingerprint rule whatever the batch
  * boundaries, and mid-stream compaction changes nothing.
  */
class StreamingExactDedupSpec extends SparkTestBase {

  private def corpus = {
    import spark.implicits._
    // duplicates within AND across the batch splits below
    (0L until 30L).map { i =>
      val text =
        if (i % 5 == 0) "the shared   duplicate body"
        else if (i == 23L) "unique text 7"
        else s"unique text $i"
      (i, text)
    }.toDF("doc_id", "text")
  }

  private def oneShotKept(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(graft.pipeline.TextAnalysis.fingerprint(col("text")))
    df.withColumn("keep", min(col("doc_id")).over(w))
      .where(col("doc_id") === col("keep"))
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
  }

  test("batched ingest replays the one-shot rule; compaction invariant") {
    val docs = corpus
    val want = oneShotKept(docs)
    val root = java.nio.file.Files.createTempDirectory("sxd")
    val idx = root.resolve("index").toString
    val out = root.resolve("kept").toString
    // three id-ordered microbatches with a compaction between
    Seq(0L -> 10L, 10L -> 20L, 20L -> 30L).zipWithIndex.foreach {
      case ((lo, hi), i) =>
        StreamingExactDedup.processBatch(spark,
          docs.where(col("doc_id") >= lo && col("doc_id") < hi),
          "text", "doc_id", idx, out)
        if (i == 1) graft.pipeline.DedupIndex.compactIndex(spark, idx)
    }
    val got = spark.read.parquet(out)
      .select("doc").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    // the cross-batch dup (23 duplicates 7's text) was dropped
    assert(!got.contains(23L) && got.contains(7L))
    // empty batch: a no-op
    StreamingExactDedup.processBatch(spark, docs.limit(0), "text",
      "doc_id", idx, out)
    assert(spark.read.parquet(out).count() == got.size.toLong)
  }

  test("foreachBatch ingest end-to-end matches the one-shot rule") {
    val root = java.nio.file.Files.createTempDirectory("sxd_e2e")
    val idx = root.resolve("index").toString
    val out = root.resolve("kept").toString
    StreamingExactDedup.ingest(spark, sf(), idx, out)
    val got = spark.read.parquet(out)
      .select("doc").collect().map(_.getLong(0)).sorted.toSeq
    val want = oneShotKept(
      spark.read.parquet(s"${sf()}/documents.parquet"))
    assert(got == want)
  }
}
