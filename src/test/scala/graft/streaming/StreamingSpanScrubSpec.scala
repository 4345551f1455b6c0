package graft.streaming

import graft.SparkTestBase
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._

/** Span surgery on ingest: the streamed union of per-batch scrubs
  * against the frozen eval window artifact equals the one-shot
  * decontamSpanScrub, whatever the batching; replays append nothing;
  * an empty eval side still rebuilds (token-identity with the
  * untouched path), never crashes.
  */
class StreamingSpanScrubSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String)] =
    df.select("doc", "cleaned").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq

  test("streamed ingest ≡ one-shot span scrub; replay appends nothing") {
    val d = docs
    val train = d.where(col("doc_id") % 3 =!= 0)
    val eval = d.where(col("doc_id") % 3 === 0)
    val want = rows(Dedup.decontamSpanScrub(train, eval, "text",
      "doc_id", w = 8))
    // the scrub actually bites on this corpus (otherwise the row
    // would pass vacuously)
    val full = d.select(col("doc_id").as("doc"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(want.exists { case (id, cleaned) => cleaned != full(id) },
      "fixture premise: at least one span must be scrubbed")

    val stage = java.nio.file.Files.createTempDirectory("sscrub_s")
    val staged = stage.resolve("train.parquet").toString
    train.write.parquet(staged)
    val out = stage.resolve("scrubbed").toString
    StreamingSpanScrub.ingest(spark, staged, "doc_id", "text", eval,
      out, w = 8, nBatches = 3)
    assert(rows(spark.read.parquet(out)) == want)

    // replayed delivery of a completed batch appends nothing
    val ev = Dedup.decontamEval(eval, "text", "doc_id", w = 8)
    val n0 = spark.read.parquet(out).count()
    def deliver(): Unit = BatchLedger.once(spark, out, "spec-run", 0L) {
      StreamingSpanScrub.processBatch(train.limit(10), ev, out)
    }
    deliver()
    val n1 = spark.read.parquet(out).count()
    deliver() // same (runId, batchId): marker-guarded no-op
    assert(spark.read.parquet(out).count() == n1 && n1 >= n0)
    Dedup.releaseDecontamEval(ev)
  }

  test("empty eval side: no bloom, nothing scrubbed, rebuild semantics preserved") {
    val d = docs.limit(20)
    val ev = Dedup.decontamEval(docs.limit(0), "text", "doc_id", w = 8)
    assert(ev.bloom.isEmpty)
    val got = rows(Dedup.decontamSpanScrubAgainst(d, ev))
    // token-identical to the one-shot scrub against an empty eval
    val want = rows(Dedup.decontamSpanScrub(d, docs.limit(0), "text",
      "doc_id", w = 8))
    assert(got == want)
    Dedup.releaseDecontamEval(ev)
  }
}
