package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Persisted exact-dedup fingerprint index — the incremental
  * lifecycle for exact deduplication: build once over the corpus so
  * far, probe each new increment against it (and against itself),
  * append the novel fingerprints. Completes the persisted-index triad
  * with [[Ivf]] and [[Bm25]] — a periodically-recrawled corpus never
  * re-fingerprints history to dedup an increment.
  *
  * Layout: one (fp, doc) row per DISTINCT fingerprint (the min-id
  * keeper), PARTITIONED BY `pmod(xxhash64(fp), 64)`, repartitioned on
  * the bucket before the dynamic-partition write so each bucket
  * directory gains ONE file per pass. A probe collects the
  * increment's distinct buckets (≤ 64 rows, one tiny agg) and pushes
  * them as a partition filter — a small increment reads only the
  * touched directories (spec-measured via the scan's file metric); a
  * full-corpus probe reads everything, as it must.
  *
  * 100 TB: the index holds (16-byte md5, id) per unique document — a
  * sliver of corpus bytes; the probe is ONE fp equi-join of two slim
  * frames (text never shuffles). Appends are additive under the
  * disjoint-increment contract; compaction is the shared crash-safe
  * [[graft.core.ParquetCompact]] pass, contents-invariant.
  */
object DedupIndex {

  val IndexBuckets = 64

  private def bucketOf(fp: Column): Column =
    pmod(xxhash64(fp), lit(IndexBuckets.toLong))

  /** Build the index: one (fp, doc) row per distinct fingerprint,
    * doc = min id (the keeper), overwriting any existing layout.
    */
  def writeIndex(spark: SparkSession, docs: DataFrame, textCol: String,
                 idCol: String, path: String): Unit =
    docs.select(TextAnalysis.fingerprint(col(textCol)).as("fp"),
        col(idCol).as("doc"))
      .groupBy(col("fp")).agg(min(col("doc")).as("doc"))
      .withColumn("bucket", bucketOf(col("fp")))
      .repartition(IndexBuckets, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Probe + the index-side keeper column (internal: [[probe]] hides
    * it, [[appendNovel]] filters on it).
    */
  private def probeRaw(spark: SparkSession, path: String, docs: DataFrame,
                       textCol: String, idCol: String): DataFrame = {
    // slim (doc, fp) frame pinned once: three consumers (bucket-set
    // agg, batch-keeper agg, probe join) must not re-run the md5 scan
    val fps = docs.select(col(idCol).as("doc"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .localCheckpoint(true)
    val buckets = fps.select(bucketOf(col("fp")).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    if (buckets.isEmpty)
      return fps.withColumn("idx_keep", lit(null).cast("long"))
        .withColumn("batch_keep", col("doc"))
    val idx0 = spark.read.parquet(path)
    val idx = idx0
      .where(graft.core.PartitionIn.inSet(idx0, "bucket", buckets))
      .select(col("fp"), col("doc").as("idx_keep"))
    val batchKeep = fps.groupBy(col("fp"))
      .agg(min(col("doc")).as("batch_keep"))
    // left join is safe against row blowup: the index invariant is
    // one row per fp (build groups, appends add only novel fps)
    fps.join(idx, Seq("fp"), "left").join(batchKeep, Seq("fp"))
  }

  /** Classify every increment doc against the index AND the increment
    * itself: `keep_id` = the index keeper when the fingerprint is
    * already indexed, else the increment's min-id holder; `dup` =
    * this doc is not the keeper. With id-ordered increments the
    * decisions equal a one-shot [[Dedup.dropExactDups]] over the
    * union (spec-pinned).
    */
  def probe(spark: SparkSession, path: String, docs: DataFrame,
            textCol: String, idCol: String): DataFrame =
    probeRaw(spark, path, docs, textCol, idCol)
      .withColumn("keep_id", coalesce(col("idx_keep"), col("batch_keep")))
      .withColumn("dup", col("keep_id") =!= col("doc"))
      .select(col("doc"), col("fp"), col("keep_id"), col("dup"))
      // snapshot semantics: the decisions are pinned NOW, so a caller
      // following the documented probe→append→compact order can
      // consume them after the compaction rewrote the files a lazy
      // plan would still be pointing at
      .localCheckpoint(true)

  /** Append the increment's NOVEL fingerprints (not in the index) as
    * one (fp, min-id) row each. Disjoint-increment contract as the
    * IVF/BM25 appends: a doc must appear in exactly one increment.
    * Each append adds ≤ one file per touched bucket; run
    * [[compactIndex]] periodically.
    */
  def appendNovel(spark: SparkSession, docs: DataFrame, textCol: String,
                  idCol: String, path: String): Unit =
    probeRaw(spark, path, docs, textCol, idCol)
      .where(col("idx_keep").isNull)
      .groupBy(col("fp")).agg(min(col("batch_keep")).as("doc"))
      .withColumn("bucket", bucketOf(col("fp")))
      .repartition(IndexBuckets, col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(path)

  /** Crash-safe in-place small-file compaction; contents-invariant,
    * so probe results are unchanged (spec-pinned).
    */
  def compactIndex(spark: SparkSession, path: String): Unit =
    graft.core.ParquetCompact.compact(spark, path, Seq("bucket"), Seq("fp"))
}
