package graft.streaming

import graft.SparkTestBase
import graft.pipeline.{Hybrid, Ivf}
import org.apache.spark.sql.functions._

/** Streaming paired-hybrid ingest: the stream-grown BM25+IVF pair
  * serves identically to the scan-based fusion whatever the batch
  * boundaries, both sides hold exactly the one-shot contents, and a
  * replayed batch is a per-side no-op.
  */
class StreamingHybridSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")
    .select(col("doc_id"), col("text"))
  private def emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private val queries =
    Seq(0L -> "hash join", 1L -> "fast table scan", 2L -> "merge sort window")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Int)] =
    df.select("qid", "doc", "rrf_fp", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq

  test("foreachBatch ingest serves ≡ the scan-based hybrid; both sides complete") {
    val d = docs
    val e = emb
    val model = Ivf.train(e, "embedding", "vec_id", nlist = 16, iters = 3)
    val qv = e.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("vec"))
    val want = rows(Hybrid.hybridTopK(spark, d, "text", "doc_id", e,
      "vec_id", "embedding", queries, qv, kCand = 20, k = 10))

    val root = java.nio.file.Files.createTempDirectory("shyb")
      .resolve("index").toString
    StreamingHybrid.ingest(spark, sf(), model, root, nBatches = 4,
      compactEvery = 2)
    // both sides hold exactly the full corpus (no skipped batch on
    // either side — the skew the paired lifecycle exists to prevent)
    assert(spark.read.parquet(s"$root/ivf").count() == e.count())
    // the quantizer sidecar is recoverable from the root alone, even
    // though the layout was created by append-mode first contact
    assert(Hybrid.loadModel(spark, root).centroids.zip(model.centroids)
      .forall { case (a, b) => a.sameElements(b) })
    val got = rows(Hybrid.searchIndex(spark, root, queries, qv, model,
      "embedding", "vec_id", kCand = 20, k = 10, nprobe = 16))
    assert(got == want)
  }

  test("a replayed batch is a per-side no-op (marker-guarded)") {
    val d = docs
    val e = emb
    val model = Ivf.train(e, "embedding", "vec_id", nlist = 16, iters = 3)
    val root = java.nio.file.Files.createTempDirectory("shyb_rp")
      .resolve("index").toString
    val mid = d.agg(max(col("doc_id"))).head().getLong(0) / 2
    val lowD = d.where(col("doc_id") <= mid)
    def deliver(): Unit = StreamingHybrid.processBatch(spark, lowD,
      "text", "doc_id", e, "vec_id", "embedding", model, root,
      runId = "spec-run", batchId = 0L)
    deliver()
    deliver() // re-delivery of the same (runId, batchId)
    assert(spark.read.parquet(s"$root/ivf").count() ==
      e.where(col("vec_id") <= mid).count())
  }

  test("ledger wipe witnesses the PAIRED sub-layouts, not the root") {
    // the hybrid oplog ledger lives INSIDE $root, so witnessing $root
    // is a tautology (stale markers imply the root exists) — after a
    // delete-everything pass removes both sub-layouts, re-opening the
    // same run key must WIPE the stale markers so the re-ingest
    // appends instead of skipping every batch into an empty index
    val root = java.nio.file.Files.createTempDirectory("shyb_wipe")
      .resolve("pair").toString
    val ledger = s"$root/oplog"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def openWithWitnesses(): String =
      BatchLedger.openRunForIndex(spark, ledger, "hybrid-runkey",
        dataPaths = Seq(s"$root/bm25", s"$root/ivf"))
    // simulate a completed ingest: both layouts present + markers
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/bm25"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$root/ivf"))
    BatchLedger.mark(spark, ledger, "hybrid-runkey", 0L)
    // both witnesses present -> markers survive (crash-heal path)
    openWithWitnesses()
    assert(BatchLedger.done(spark, ledger, "hybrid-runkey", 0L),
      "markers must survive while the guarded layouts exist")
    // delete-everything removes the sub-layouts but not the in-root
    // ledger — the exact state the root-witness bug skipped over
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/bm25"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/ivf"), true)
    openWithWitnesses()
    assert(!BatchLedger.done(spark, ledger, "hybrid-runkey", 0L),
      "one vanished side means every marker is stale - wipe must fire")
  }
}
