package graft.streaming

import graft.pipeline.NearDupIndex
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash near-dup deduplication ON INGEST, riding the persisted
  * [[NearDupIndex]] — the exact-Jaccard-verified sibling of the
  * simhash [[StreamingDedup]]: each microbatch probes the
  * accumulated band index (cell- and page-pruned), drops every
  * document with an EARLIER near-dup (earlier id in the same batch,
  * or anything already indexed — kept and dropped alike, the
  * training-data contract), and indexes the whole batch.
  *
  * Drop policy is RELATIONAL over the pair set: with id-ordered
  * disjoint batches, probe pairs are (d1 < d2, jac ≥ t) with d2 in
  * the batch, so dropped(d) ⇔ d appears as some pair's d2 — the kept
  * set is batch-boundary-independent and equals "documents that are
  * nobody's later near-dup" over the one-shot LSH pass, which the
  * oracle replays from the minhash_pairs golden directly.
  */
object StreamingMinhashDedup {

  /** One microbatch: probe (or build on the first batch), append kept
    * doc ids to `outPath`, index the batch. Exposed for testing.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, textCol: String,
                   idCol: String, indexPath: String, outPath: String,
                   threshold: Double): Unit = {
    if (batch.isEmpty) return
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pairs =
      if (!fs.exists(new org.apache.hadoop.fs.Path(indexPath)))
        NearDupIndex.buildWithPairs(spark, batch, textCol, idCol,
          indexPath, threshold = threshold)
      else
        NearDupIndex.probeAndAppend(spark, indexPath, batch, textCol,
          idCol, threshold = threshold)
    // dropped ⇔ the batch doc is some pair's LATER side (d2); pairs
    // are already materialized snapshots, so this is a slim anti-join
    batch.select(col(idCol).as("doc"))
      .join(pairs.select(col("d2").as("doc")).distinct(),
        Seq("doc"), "left_anti")
      .write.mode(SaveMode.Append).parquet(outPath)
  }

  /** Stream the documents table through the incremental near-dup;
    * kept doc ids land in `outPath`, the band/sets index in
    * `indexPath`. `compactEvery` > 0 compacts periodically
    * (contents-invariant).
    */
  def ingest(spark: SparkSession, dir: String, indexPath: String,
             outPath: String, threshold: Double = 0.2,
             compactEvery: Int = 0,
             compactFilesPerDir: Double = 0.0): Unit = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stage = java.nio.file.Files.createTempDirectory("graft_smdedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      stage.resolve("documents.parquet"))
    val stream = spark.readStream.schema(schema).parquet(stage.toString)
    val ckpt = EventStream.scratchCheckpointDir(spark, "graft_smdedup_ckpt_")
    val runId = BatchLedger.openRunForIndex(spark, indexPath,
      Staging.runKey(spark, s"$dir/documents.parquet", "doc_id", 1, kind = "mdup"),
      dataPath = indexPath)
    val q = stream.writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // idempotent under foreachBatch's same-batchId replay (see
        // BatchLedger): guards the band append and the kept-id write
        BatchLedger.once(batch.sparkSession, indexPath, runId, batchId) {
          processBatch(batch.sparkSession, batch, "text", "doc_id",
            indexPath, outPath, threshold)
        }
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          NearDupIndex.compactIndex(batch.sparkSession, indexPath)
        // file-count alarm: compact when measured append debris
        // says so, not a blind cadence
        graft.core.ParquetCompact.maybeCompact(
          batch.sparkSession, indexPath, compactFilesPerDir) {
          NearDupIndex.compactIndex(batch.sparkSession, indexPath)
        }
      }
      .start()
    try q.processAllAvailable() finally {
      q.stop()
      EventStream.deleteScratch(ckpt)
    }
  }
}
