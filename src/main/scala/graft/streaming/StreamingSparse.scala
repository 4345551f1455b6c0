package graft.streaming

import graft.pipeline.Sparse
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sparse-vector index maintenance ON INGEST — the learned-sparse
  * entry in the streaming × persisted-index matrix: each microbatch
  * sparsifies its vectors under the FROZEN (tau, scale) contract and
  * appends the postings to the persisted [[Sparse]] dim-bucket
  * layout. Postings are per-doc rows and scoring sums are additive
  * over them, so the grown index serves identically to a one-shot
  * build over the union regardless of batch boundaries or arrival
  * order — the oracle is the same direct-SQL brute force every batch
  * sparse row replays.
  *
  * Exactly-once per batch via the shared ledger (same-batchId
  * replays no-op); compaction on the measured file-count alarm, not
  * a cadence guess.
  */
object StreamingSparse {

  /** One microbatch: sparsify and append. Exposed for testing. */
  def processBatch(spark: SparkSession, batch: DataFrame, vecCol: String,
                   idCol: String, indexPath: String, tau: Double,
                   scale: Double): Unit = {
    if (batch.isEmpty) return
    Sparse.appendToIndex(spark,
      Sparse.sparsify(batch, vecCol, idCol, tau, scale), indexPath)
  }

  /** Stream the embeddings table (replayed as `nBatches` id-ordered
    * microbatches) into a persisted sparse index at `indexPath`.
    */
  def ingest(spark: SparkSession, dir: String, indexPath: String,
             nBatches: Int = 4, tau: Double = 0.05,
             scale: Double = Sparse.DefaultScale,
             compactFilesPerDir: Double = 0.0): Unit = {
    val src = s"$dir/embeddings.parquet"
    val schema = spark.read.parquet(src).schema
    val stage = Staging.idRangeSplits(spark, src, "vec_id", nBatches)
    val ckpt = EventStream.scratchCheckpointDir(spark, "graft_ssparse_ckpt_")
    val runId = BatchLedger.openRunForIndex(spark, indexPath,
      Staging.runKey(spark, src, "vec_id", nBatches, kind = "sparse"),
      dataPath = indexPath)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        BatchLedger.once(batch.sparkSession, indexPath, runId, batchId) {
          processBatch(batch.sparkSession, batch, "embedding", "vec_id",
            indexPath, tau, scale)
        }
        graft.core.ParquetCompact.maybeCompact(
          batch.sparkSession, indexPath, compactFilesPerDir) {
          Sparse.compactIndex(batch.sparkSession, indexPath)
        }
      }
      .start()
    try q.processAllAvailable() finally {
      q.stop()
      EventStream.deleteScratch(ckpt)
      EventStream.deleteScratch(stage)
    }
  }
}
