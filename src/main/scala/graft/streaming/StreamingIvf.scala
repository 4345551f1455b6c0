package graft.streaming

import graft.pipeline.{Ivf, IvfModel}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** IVF vector-index maintenance ON INGEST — the vector-retrieval
  * entry in the streaming × persisted-index matrix: embeddings
  * arriving in microbatches are assigned against a FROZEN coarse
  * quantizer (the standard IVF deployment: train offline on a
  * sample, add online — Jégou et al., PAMI 2011) and appended into
  * the cluster-partitioned on-disk layout, with periodic
  * contents-invariant compaction.
  *
  * Cluster assignment is per-row against the frozen model, so the
  * grown index holds exactly the postings a one-shot build over the
  * union would — search results are batch-boundary- and
  * arrival-order-independent, and the oracle is the one-shot
  * ivf_topk golden.
  *
  * 100 TB shape inherited from Ivf: assignment is a codegen
  * map-side expression (no shuffle), appends are dynamic-partition
  * writes touching only the batch's clusters, probes partition-prune
  * to nprobe cluster directories.
  */
object StreamingIvf {

  /** One microbatch: assign against the frozen quantizer and append.
    * Append-mode creates the layout on first contact, so there is no
    * separate first-batch branch. Exposed for testing.
    */
  def processBatch(batch: DataFrame, vecCol: String, model: IvfModel,
                   indexPath: String): Unit = {
    if (batch.isEmpty) return
    Ivf.appendToIndex(batch, vecCol, model, indexPath)
  }

  /** Stream the embeddings table (replayed as `nBatches` id-ordered
    * microbatches) into a persisted IVF index at `indexPath` against
    * the pre-trained `model`. `compactEvery` > 0 compacts after
    * every that-many batches.
    */
  def ingest(spark: SparkSession, dir: String, model: IvfModel,
             indexPath: String, nBatches: Int = 4,
             compactEvery: Int = 0): Unit = {
    val src = s"$dir/embeddings.parquet"
    val schema = spark.read.parquet(src).schema
    val stage = Staging.idRangeSplits(spark, src, "vec_id", nBatches)
    val ckpt = EventStream.scratchCheckpointDir(spark, "graft_sivf_ckpt_")
    val runId = BatchLedger.openRun(spark, indexPath, ckpt)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // idempotent under foreachBatch's same-batchId replay (see
        // BatchLedger): a re-delivered completed batch is a no-op
        BatchLedger.once(batch.sparkSession, indexPath, runId, batchId) {
          processBatch(batch, "embedding", model, indexPath)
        }
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
          Ivf.compactIndex(batch.sparkSession, indexPath)
      }
      .start()
    try q.processAllAvailable() finally {
      q.stop()
      EventStream.deleteScratch(ckpt)
      EventStream.deleteScratch(stage)
    }
  }
}
