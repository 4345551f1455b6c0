package graft.streaming

import graft.SparkTestBase
import graft.pipeline.{Dedup, EmbedDedupIndex, Similarity}
import org.apache.spark.sql.functions._

/** Streaming semantic dedup over the persisted EmbedDedupIndex: the
  * kept set equals "nobody's later near-dup" over the one-shot
  * signature-blocked pair set whatever the batch boundaries, and
  * mid-stream compaction changes nothing.
  */
class StreamingEmbedDedupSpec extends SparkTestBase {

  private def emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def oneShotKept(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    val pairs = Dedup.cosinePairsBlocked(
      df.select(col("vec_id"), col("embedding"),
        Similarity.hyperplaneSig(col("embedding"), 64, bits = 8)
          .as("bucket")),
      "embedding", "vec_id", "bucket", threshold = 0.3)
    val losers = pairs.select(col("d2")).distinct()
      .collect().map(_.getLong(0)).toSet
    df.select("vec_id").collect().map(_.getLong(0))
      .filterNot(losers).sorted.toSeq
  }

  test("batched ingest replays the one-shot rule; compaction invariant") {
    val e = emb
    val want = oneShotKept(e)
    val root = java.nio.file.Files.createTempDirectory("sed")
    val idx = root.resolve("index").toString
    val out = root.resolve("kept").toString
    Seq(0L -> 150L, 150L -> 300L, 300L -> 100000L).zipWithIndex.foreach {
      case ((lo, hi), i) =>
        StreamingEmbedDedup.processBatch(spark,
          e.where(col("vec_id") >= lo && col("vec_id") < hi),
          "embedding", "vec_id", idx, out, dim = 64, bits = 8,
          threshold = 0.3)
        if (i == 1) EmbedDedupIndex.compactIndex(spark, idx)
    }
    val got = spark.read.parquet(out)
      .select("doc").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    // empty batch: a no-op
    StreamingEmbedDedup.processBatch(spark, e.limit(0), "embedding",
      "vec_id", idx, out, 64, 8, 0.3)
    assert(spark.read.parquet(out).count() == got.size.toLong)
  }

  test("foreachBatch ingest end-to-end matches the one-shot rule") {
    val root = java.nio.file.Files.createTempDirectory("sed_e2e")
    val idx = root.resolve("index").toString
    val out = root.resolve("kept").toString
    StreamingEmbedDedup.ingest(spark, sf(), idx, out, nBatches = 3,
      compactEvery = 2)
    val got = spark.read.parquet(out)
      .select("doc").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == oneShotKept(emb))
  }
}
