package graft.streaming

import graft.SparkTestBase
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** Streaming MinHash near-dup over the persisted NearDupIndex: kept ⇔
  * nobody's later near-dup in the one-shot LSH pair set, whatever the
  * batch boundaries; mid-stream compaction changes nothing.
  */
class StreamingMinhashDedupSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def oneShotKept(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    val dropped = Dedup.minhashCandidatePairs(df, "text", "doc_id",
        w = 3, bands = 16, rows = 4, threshold = 0.2)
      .select(col("d2").as("doc_id")).distinct()
    df.select("doc_id").join(dropped, Seq("doc_id"), "left_anti")
      .collect().map(_.getLong(0)).sorted.toSeq
  }

  test("batched ingest replays the one-shot rule; compaction invariant") {
    val want = oneShotKept(docs)
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val cut1 = maxId / 3
    val cut2 = 2 * maxId / 3
    val root = java.nio.file.Files.createTempDirectory("smd")
    val idx = root.resolve("index").toString
    val out = root.resolve("kept").toString
    Seq(
      docs.where(col("doc_id") <= cut1),
      docs.where(col("doc_id") > cut1 && col("doc_id") <= cut2),
      docs.where(col("doc_id") > cut2)
    ).zipWithIndex.foreach { case (b, i) =>
      StreamingMinhashDedup.processBatch(spark, b, "text", "doc_id",
        idx, out, threshold = 0.2)
      if (i == 1) graft.pipeline.NearDupIndex.compactIndex(spark, idx)
    }
    val got = spark.read.parquet(out)
      .select("doc").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    assert(got.size < docs.count(), "fixture must actually drop near-dups")
    // empty batch: a no-op
    StreamingMinhashDedup.processBatch(spark, docs.limit(0), "text",
      "doc_id", idx, out, threshold = 0.2)
    assert(spark.read.parquet(out).count() == got.size.toLong)
  }
}
