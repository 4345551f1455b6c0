package graft.streaming

import graft.SparkTestBase
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** Decontamination on ingest: the streamed union of per-batch probes
  * against the frozen eval artifact equals the one-shot cross-corpus
  * join, whatever the batching, and a replayed batch appends nothing.
  */
class StreamingDecontamSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def pairRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.select("left_doc", "right_doc", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("streamed ingest ≡ one-shot cross-corpus pairs; replay appends nothing") {
    val d = docs
    val train = d.where(col("doc_id") % 2 === 0)
    val eval = d.where(col("doc_id") % 2 === 1)
    val want = pairRows(Dedup.crossJaccardPairs(train, eval, "text",
      "doc_id", w = 3, threshold = 0.1))

    val stage = java.nio.file.Files.createTempDirectory("sdecon_s")
    val staged = stage.resolve("train.parquet").toString
    train.write.parquet(staged)
    val out = stage.resolve("pairs").toString
    StreamingDecontam.ingest(spark, staged, "doc_id", "text", eval,
      out, w = 3, threshold = 0.1, nBatches = 3)
    assert(pairRows(spark.read.parquet(out)) == want)

    // replayed delivery of a completed batch appends nothing
    val ev = Dedup.decontamEval(eval, "text", "doc_id", w = 3)
    val n0 = spark.read.parquet(out).count()
    def deliver(): Unit = BatchLedger.once(spark, out, "spec-run", 0L) {
      StreamingDecontam.processBatch(train.limit(20), ev, 0.1, out)
    }
    deliver()
    val n1 = spark.read.parquet(out).count()
    deliver() // same (runId, batchId): marker-guarded no-op
    assert(spark.read.parquet(out).count() == n1 && n1 >= n0)
    Dedup.releaseDecontamEval(ev)
  }

  test("empty eval side: no artifact bloom, every batch is pair-free") {
    val d = docs
    val ev = Dedup.decontamEval(d.limit(0), "text", "doc_id", w = 3)
    assert(ev.bloom.isEmpty)
    assert(Dedup.crossJaccardPairsAgainst(d.limit(30), ev, 0.2).isEmpty)
    Dedup.releaseDecontamEval(ev)
  }
}
