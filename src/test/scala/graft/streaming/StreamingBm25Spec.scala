package graft.streaming

import graft.SparkTestBase
import graft.pipeline.Bm25
import org.apache.spark.sql.functions._

/** Streaming BM25 index maintenance: the stream-grown layout is
  * search-identical to a one-shot build whatever the batch
  * boundaries, and mid-stream compaction changes nothing.
  */
class StreamingBm25Spec extends SparkTestBase {

  private val queries = Seq(0L -> "hash join", 1L -> "fast table scan",
    2L -> "merge sort window")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Int)] =
    df.select("qid", "doc", "score_fp", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq

  test("batched appends replay the one-shot build; compaction invariant") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val want = rows(Bm25.topK(spark, docs, "text", "doc_id", queries, k = 10))
    val idx = java.nio.file.Files.createTempDirectory("sbm25")
      .resolve("index").toString
    // three id-ordered microbatches with a compaction between
    Seq(0L -> 150L, 150L -> 300L, 300L -> 10000L).zipWithIndex.foreach {
      case ((lo, hi), i) =>
        StreamingBm25.processBatch(spark,
          docs.where(col("doc_id") >= lo && col("doc_id") < hi),
          "text", "doc_id", idx)
        if (i == 1) Bm25.compactIndex(spark, idx)
    }
    assert(rows(Bm25.searchIndex(spark, idx, queries, k = 10)) == want)
    // multi-batch appends really happened: the mid-stream compaction
    // collapsed the first two increments' stats rows into their sum,
    // and the third increment appended its own row
    assert(spark.read.parquet(s"$idx/stats").count() == 2L)
    // empty batch: a no-op
    StreamingBm25.processBatch(spark, docs.limit(0), "text", "doc_id", idx)
    assert(rows(Bm25.searchIndex(spark, idx, queries, k = 10)) == want)
  }

  test("foreachBatch replay of a completed batchId is a no-op") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val idx = java.nio.file.Files.createTempDirectory("sbm25_lg")
      .resolve("index").toString
    def append(run: String, id: Long, lo: Long, hi: Long): Unit =
      BatchLedger.once(spark, idx, run, id) {
        StreamingBm25.processBatch(spark,
          docs.where(col("doc_id") >= lo && col("doc_id") < hi),
          "text", "doc_id", idx)
      }
    append("run1", 0L, 0L, 200L)
    val statsAfter0 = spark.read.parquet(s"$idx/stats").count()
    append("run1", 0L, 0L, 200L) // replayed delivery of the same batch
    assert(spark.read.parquet(s"$idx/stats").count() == statsAfter0,
      "replayed batch must not double-append")
    append("run1", 1L, 200L, 10000L) // a NEW batch still appends
    assert(spark.read.parquet(s"$idx/stats").count() == statsAfter0 + 1)
    // the ledger lives beside the index, so compaction (which swaps
    // the index dir wholesale and collapses stats to its one-row
    // sum) preserves it
    Bm25.compactIndex(spark, idx)
    append("run1", 1L, 200L, 10000L) // replay AFTER compaction: still a no-op
    assert(spark.read.parquet(s"$idx/stats").count() == 1L,
      "replayed batch after compaction must not append a stats row")
  }

  test("a SECOND ingest run's batchId 0 is not shadowed by the first run's") {
    // regression: batchIds are per-checkpoint and restart at 0 per
    // run, while the ledger persists beside the index — markers must
    // be namespaced by run or a later ingest into the same long-lived
    // index silently drops every batch
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val idx = java.nio.file.Files.createTempDirectory("sbm25_rr")
      .resolve("index").toString
    BatchLedger.once(spark, idx, "bm25-runA", 0L) {
      StreamingBm25.processBatch(spark,
        docs.where(col("doc_id") < 200L), "text", "doc_id", idx)
    }
    val after1 = spark.read.parquet(s"$idx/stats").count()
    // new run, fresh checkpoint, batchId 0 again — MUST still append
    BatchLedger.once(spark, idx, "bm25-runB", 0L) {
      StreamingBm25.processBatch(spark,
        docs.where(col("doc_id") >= 200L), "text", "doc_id", idx)
    }
    assert(spark.read.parquet(s"$idx/stats").count() == after1 + 1,
      "a fresh run's batch 0 must not be skipped by the old run's marker")
    // marker GC: pruning keeps only the live run's namespace WITHIN
    // its own pipeline kind (the `<kind>-` prefix — another
    // pipeline's crashed-run markers on the same index must survive),
    // and the live run's replay guard still holds afterwards
    BatchLedger.once(spark, idx, "ivf-other", 0L) {} // another pipeline's marker
    BatchLedger.pruneOtherRuns(spark, idx, "bm25-runB")
    val ledger = new java.io.File(idx + "__ledger").listFiles()
    assert(ledger != null &&
      ledger.map(_.getName).toSet == Set("bm25-runB", "ivf-other"),
      "GC must prune only same-kind runs")
    BatchLedger.once(spark, idx, "bm25-runB", 0L) {
      fail("pruning must not forget the live run's own markers")
    }
    BatchLedger.once(spark, idx, "bm25-runA", 0L) {
      StreamingBm25.processBatch(spark,
        docs.where(col("doc_id") < 100L), "text", "doc_id", idx)
    } // runA's markers are gone: this appends again (a dead run never
      // resumes under the single-writer contract; the GC trades its
      // markers for a bounded store)
    assert(spark.read.parquet(s"$idx/stats").count() == after1 + 2)
  }

  test("stream-grown layout still partition-prunes, even pre-compaction") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val idx = java.nio.file.Files.createTempDirectory("sbm25_pr")
      .resolve("index").toString
    // three appends, NO compaction: the many-small-files shape
    Seq(0L -> 150L, 150L -> 300L, 300L -> 10000L).foreach { case (lo, hi) =>
      StreamingBm25.processBatch(spark,
        docs.where(col("doc_id") >= lo && col("doc_id") < hi),
        "text", "doc_id", idx)
    }
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      val qe = df.queryExecution
      qe.executedPlan.execute().count()
      qe.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.sum
    }
    val all = filesRead(spark.read.parquet(s"$idx/postings"))
    val pruned = filesRead(spark.read.parquet(s"$idx/postings")
      .where(col("bucket").isInCollection(Seq(0L, 1L))))
    assert(pruned < all,
      s"bucket filter must cut files on the grown layout: all=$all pruned=$pruned")
  }

  test("foreachBatch ingest end-to-end matches the one-shot build") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val want = rows(Bm25.topK(spark, docs, "text", "doc_id", queries, k = 10))
    val idx = java.nio.file.Files.createTempDirectory("sbm25_e2e")
      .resolve("index").toString
    StreamingBm25.ingest(spark, sf(), idx, nBatches = 4, compactEvery = 2)
    assert(rows(Bm25.searchIndex(spark, idx, queries, k = 10)) == want)
    // the stage split really produced multiple microbatches
    assert(spark.read.parquet(s"$idx/stats").count() >= 2L)
  }

  test("a crashed run's rerun heals via the stable run key (no double append)") {
    // regression (r10 ADVICE): runIds derived from the per-process
    // scratch checkpoint made a crash+rerun replay every batch into a
    // fresh marker namespace, double-appending everything the crashed
    // run had committed. The stable key (source identity + content
    // fingerprint) makes the rerun reuse the crashed run's namespace.
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val want = rows(Bm25.topK(spark, docs, "text", "doc_id", queries, k = 10))
    val idx = java.nio.file.Files.createTempDirectory("sbm25_crash")
      .resolve("index").toString
    val src = s"${sf()}/documents.parquet"
    val key = Staging.runKey(spark, src, "doc_id", 4, kind = "bm25")
    // simulate the crashed run: batch 0 (the first id-range split)
    // committed — data appended AND marker written — then death
    val r = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val span = math.max(1L, (hi - lo) / 4 + 1L)
    BatchLedger.once(spark, idx, key, 0L) {
      StreamingBm25.processBatch(spark,
        docs.where(col("doc_id") >= lo && col("doc_id") < lo + span),
        "text", "doc_id", idx)
    }
    // the rerun derives the same key: batch 0 skips, batches 1..3 run
    StreamingBm25.ingest(spark, sf(), idx, nBatches = 4)
    assert(spark.read.parquet(s"$idx/stats").count() == 4L,
      "rerun must complete only the missing batches, not re-append batch 0")
    assert(rows(Bm25.searchIndex(spark, idx, queries, k = 10)) == want)
  }

  test("rebuilding a deleted index from the same source re-runs every batch") {
    // regression: the ledger lives at the sibling <idx>__ledger and
    // survives deletion of the index itself; under the stable run
    // key, a rebuild would otherwise find every batch "completed"
    // and return success over a missing layout
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val want = rows(Bm25.topK(spark, docs, "text", "doc_id", queries, k = 10))
    val idx = java.nio.file.Files.createTempDirectory("sbm25_rebuild")
      .resolve("index").toString
    StreamingBm25.ingest(spark, sf(), idx, nBatches = 3)
    assert(rows(Bm25.searchIndex(spark, idx, queries, k = 10)) == want)
    // operator wipes the index (not the ledger), then rebuilds
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idx), true)
    assert(new java.io.File(idx + "__ledger").exists(),
      "fixture premise: the ledger must survive the index deletion")
    StreamingBm25.ingest(spark, sf(), idx, nBatches = 3)
    assert(rows(Bm25.searchIndex(spark, idx, queries, k = 10)) == want,
      "the rebuild must re-ingest, not skip to an empty index")
  }

  test("re-running an identical completed ingest is a no-op") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val want = rows(Bm25.topK(spark, docs, "text", "doc_id", queries, k = 10))
    val idx = java.nio.file.Files.createTempDirectory("sbm25_rerun")
      .resolve("index").toString
    StreamingBm25.ingest(spark, sf(), idx, nBatches = 3)
    val statsRows = spark.read.parquet(s"$idx/stats").count()
    StreamingBm25.ingest(spark, sf(), idx, nBatches = 3)
    assert(spark.read.parquet(s"$idx/stats").count() == statsRows,
      "an identical rerun keys the same namespace: every batch skips")
    assert(rows(Bm25.searchIndex(spark, idx, queries, k = 10)) == want)
  }
}
