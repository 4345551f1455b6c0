package graft.streaming

import graft.pipeline.{IvfModel, MultiVector}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Late-interaction index maintenance ON INGEST — the multi-vector
  * entry in the streaming × persisted-index matrix: each microbatch
  * of (doc, vec) rows is assigned ONCE under the frozen coarse
  * quantizer and appended to both sub-layouts
  * ([[MultiVector.appendDocs]]). Rows are per-vector and the scorer
  * is max/sum over whatever rows a doc has, so the grown pair serves
  * identically to a one-shot build over the union — batch boundaries
  * may even split one document's vectors across increments without
  * affecting a single score (the gather reads every row of a
  * candidate doc regardless of which increment landed it).
  *
  * Exactly-once per batch via the shared ledger; compaction of the
  * two sub-layouts on the measured file-count alarm.
  */
object StreamingMultiVector {

  /** One microbatch: derive (doc, vec) rows and append to the pair.
    * Exposed for testing.
    */
  def processBatch(spark: SparkSession, batch: DataFrame,
                   model: IvfModel, root: String,
                   vecsPerDoc: Int): Unit = {
    if (batch.isEmpty) return
    MultiVector.appendDocs(spark,
      batch.select((col("vec_id") / vecsPerDoc).cast("long").as("doc"),
        col("embedding").as("vec")), model, root)
  }

  /** Stream the embeddings table (replayed as `nBatches` id-ordered
    * microbatches, docs = `vecsPerDoc`-vector groups) into the
    * persisted late-interaction pair at `root`.
    */
  def ingest(spark: SparkSession, dir: String, root: String,
             model: IvfModel, nBatches: Int = 4, vecsPerDoc: Int = 4,
             compactFilesPerDir: Double = 0.0): Unit = {
    val src = s"$dir/embeddings.parquet"
    val schema = spark.read.parquet(src).schema
    val stage = Staging.idRangeSplits(spark, src, "vec_id", nBatches)
    val ckpt = EventStream.scratchCheckpointDir(spark, "graft_smv_ckpt_")
    val runId = BatchLedger.openRunForIndex(spark, root,
      Staging.runKey(spark, src, "vec_id", nBatches, kind = "multivec"),
      dataPath = s"$root/ivf")
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        BatchLedger.once(batch.sparkSession, root, runId, batchId) {
          processBatch(batch.sparkSession, batch, model, root, vecsPerDoc)
        }
        Seq(s"$root/ivf", s"$root/docs").foreach { sub =>
          graft.core.ParquetCompact.maybeCompact(
            batch.sparkSession, sub, compactFilesPerDir) {
            graft.core.ParquetCompact.compact(batch.sparkSession, sub,
              if (sub.endsWith("ivf")) Seq("cluster") else Seq("db"), Nil)
          }
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
