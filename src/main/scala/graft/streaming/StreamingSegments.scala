package graft.streaming

import graft.pipeline.Ivf
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Segment-per-microbatch dense ingest — the LSM WRITE path of the
  * multi-segment serving family ([[Ivf.readSegmentsServing]]): each
  * microbatch assigns under the FROZEN coarse quantizer and writes
  * its OWN immutable int8 segment root, `$root/seg=<batchId>`.
  *
  * Exactly-once falls out of the naming, with NO ledger: a replayed
  * batch overwrites its own segment with identical contents (the
  * staged input is deterministic) and never touches any other
  * segment — the idempotence the single-layout ingests buy with
  * [[BatchLedger]]. There is also no append-visibility window: a
  * segment either exists whole or not at all, so a concurrent
  * serve never sees a half-written increment (the immutable-segment
  * argument LSM engines make).
  *
  * Serving lists the segment roots ([[segmentRoots]]) and unions
  * them through the per-segment model witness + tombstone masks;
  * [[mergeAll]] folds segments together as BACKGROUND maintenance —
  * after it, the merged root serves identically (gate-pinned both
  * stages against the one-shot golden).
  */
object StreamingSegments {

  /** The current segment roots under `root`, name-ordered (absent
    * root = no segments yet).
    */
  def segmentRoots(spark: SparkSession, root: String): Seq[String] = {
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rp)) Seq.empty
    else fs.listStatus(rp)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("seg="))
      .map(_.getPath.toString).sorted.toSeq
  }

  /** One microbatch: assign under the frozen model, write the
    * batch's own int8 segment + its `_model` witness. Exposed for
    * testing. Empty batches create no segment (the empty-layout
    * landmine: a zero-row write would leave a _SUCCESS-only root
    * that every later segments read dies on).
    *
    * The segment is BUILT HIDDEN and renamed into place: data and
    * the `_model` witness land under `.seg=<id>__building` (the
    * dot prefix keeps [[segmentRoots]] and Spark's file index
    * blind to it), then one rename promotes the complete segment —
    * so a concurrent serve never observes data without its witness
    * (readSegmentsServing hard-requires `_model`) or a replay's
    * half-overwritten segment. A crash mid-build leaves only the
    * hidden dir (swept by the next replay of the same batch); a
    * crash in the delete→rename window leaves the segment absent —
    * an empty segment to readers — until the uncommitted batch
    * replays, which regenerates it.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, vecCol: String,
                   root: String, model: graft.pipeline.IvfModel,
                   batchId: Long): Unit = {
    if (batch.isEmpty) return
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(s"$root/.seg=${batchId}__building")
    fs.delete(tmp, true) // a prior crashed build of this batch
    Ivf.writeIndexInt8(Ivf.assign(batch, vecCol, model), vecCol,
      tmp.toString)
    Ivf.saveModel(spark, model, Ivf.modelPath(tmp.toString))
    val dst = new org.apache.hadoop.fs.Path(s"$root/seg=$batchId")
    fs.delete(dst, true) // replay: retire the old copy whole
    require(fs.rename(tmp, dst), s"promote $tmp -> $dst failed")
  }

  /** Stream the embeddings table (replayed as `nBatches` id-ordered
    * microbatches) into a segment-per-batch layout under `root`.
    */
  def ingest(spark: SparkSession, dir: String, root: String,
             model: graft.pipeline.IvfModel, nBatches: Int = 4): Unit = {
    val src = s"$dir/embeddings.parquet"
    val schema = spark.read.parquet(src).schema
    val stage = Staging.idRangeSplits(spark, src, "vec_id", nBatches)
    val ckpt = EventStream.scratchCheckpointDir(spark, "graft_ssegs_ckpt_")
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, "embedding", root, model,
          batchId)
      }
      .start()
    try q.processAllAvailable() finally {
      q.stop()
      EventStream.deleteScratch(ckpt)
      EventStream.deleteScratch(stage)
    }
  }

  /** Background maintenance: fold every segment into the first via
    * the family's file-move [[Ivf.mergeInto]] (shared-quantizer
    * witness verified per merge). Returns the surviving root, None
    * when no segments exist. Serving through
    * [[Ivf.readSegmentsServing]] before, during (merges are
    * crash-safe moves), or after the fold returns the same rows.
    */
  def mergeAll(spark: SparkSession, root: String,
               idCol: String = "vec_id"): Option[String] = {
    val segs = segmentRoots(spark, root)
    segs.headOption.map { dst =>
      segs.tail.foreach(src => Ivf.mergeInto(spark, dst, src, idCol))
      dst
    }
  }
}
