package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE one mask-contract site for the serving tiers' doc listings:
  * the filtered doc scan + tombstone anti-join that [[scroll]]-style
  * keyset pages and count-API reads share, plus the page/count
  * wrappers over the tiers' missing-layout convention. Before this
  * helper the sequence lived near-verbatim in Bm25, Sparse, and
  * MultiVector — three sites any tombstone-recovery or empty-layout
  * fix had to reach. Callers still own what is genuinely per-tier:
  * the layout recovery preamble (which sub-dirs to DirSwap-recover)
  * and the data-dir witness (dbk=/db=/postings).
  */
object LiveDocs {

  /** The filtered, tombstone-masked doc column of a layout: one
    * column-pruned scan of `readPath` under `pred`, anti-joined with
    * the (recovered — a revive swap can park the sidecar between its
    * two renames, which would serve unmasked) tombstone set at
    * `tombPath` when one exists.
    */
  def masked(spark: SparkSession, readPath: String, tombPath: String,
             docCol: String, pred: Column): DataFrame = {
    val post = spark.read.parquet(readPath)
      .where(pred)
      .select(col(docCol))
    val tp = new org.apache.hadoop.fs.Path(tombPath)
    val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    DirSwap.recover(fs, tp)
    if (!fs.exists(tp)) post
    else post.join(spark.read.parquet(tombPath)
      .select(col(docCol)).distinct(), Seq(docCol), "left_anti")
  }

  /** One keyset page over a live-doc prefix: DISTINCT ids, id-ordered,
    * cut at `limit` (TakeOrderedAndProject — O(page) rows cross the
    * driver). None = missing/data-less layout = empty page.
    */
  def page(spark: SparkSession, live: Option[DataFrame], docCol: String,
           limit: Int): DataFrame = {
    require(limit > 0, "scroll limit must be positive")
    live match {
      case None =>
        import spark.implicits._
        Seq.empty[Long].toDF(docCol)
      case Some(l) => l.distinct().orderBy(col(docCol)).limit(limit)
    }
  }

  /** Exact live-doc count over a live-doc prefix, as a one-row (cnt)
    * frame. None = missing/data-less layout = zero.
    */
  def count(spark: SparkSession, live: Option[DataFrame],
            docCol: String): DataFrame = live match {
    case None =>
      import spark.implicits._
      Seq(0L).toDF("cnt")
    case Some(l) => l.agg(countDistinct(col(docCol)).as("cnt"))
  }
}
