package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** The tombstone-sidecar REVIVE — the missing half of upsert
  * semantics on the LSM delete tiers: `tombstone(X)` then
  * `upsert(X)` must serve X's fresh copy (reference vector stores
  * treat an explicit re-add as superseding a pending delete), but the
  * mask is id-keyed — it would hide the new copy too, and the next
  * fold would physically ERASE it: silent data loss for the
  * delete-then-re-add sequence. Every upsert entry point therefore
  * rewrites the sidecar minus its batch's ids through here.
  *
  * Crash-safe via [[DirSwap]]: the surviving mask is materialized
  * BEFORE the swap (the rewrite reads the files the swap moves),
  * then park-promoted — a crash anywhere leaves a complete mask
  * either live or parked, which the serving reads' recover preamble
  * heals. An emptied mask deletes the sidecar outright (the
  * missing-dir = no-mask family convention).
  */
object TombstoneSidecar {

  /** Rewrite the sidecar at `tombDir` minus `ids` (first column,
    * whatever its name, compared against the sidecar's `idCol`).
    * Missing sidecar = nothing masked = nothing to revive.
    */
  def revive(spark: SparkSession, tombDir: String, ids: DataFrame,
             idCol: String): Unit = {
    val tp = new Path(tombDir)
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    DirSwap.recover(fs, tp)
    if (!fs.exists(tp)) return
    val survivors = spark.read.parquet(tombDir)
      .select(col(idCol)).distinct()
      .join(ids.select(col(ids.columns.head).as(idCol)),
        Seq(idCol), "left_anti")
      .localCheckpoint(true)
    try {
      if (survivors.isEmpty) fs.delete(tp, true)
      else {
        val tmp = new Path(tombDir + "__reviving")
        fs.delete(tmp, true) // a prior crashed revive's leftovers
        // one file: the mask is tiny by the fold-cadence contract and
        // every serving read re-reads it — a shuffle-partition spray
        // of near-empty parts would tax each of them (the mergeLatest
        // sidecar shape)
        survivors.coalesce(1).write.mode(SaveMode.Overwrite)
          .parquet(tmp.toString)
        DirSwap.promote(fs, tp, tmp)
      }
    } finally Pinned.release(survivors)
  }
}
