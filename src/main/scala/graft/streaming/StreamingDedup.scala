package graft.streaming

import graft.pipeline.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Near-dup deduplication ON INGEST — the missing half of the batch
  * dedup family (§ training-data pipeline): documents arrive as a
  * stream and each microbatch is deduplicated against everything seen
  * before it, without ever re-scanning the corpus.
  *
  * Design (the 100 TB ingestion shape):
  *  - per-document work is a single simhash over the text
  *    ([[Dedup.simhash64]], 64-bit signature);
  *  - the accumulated state is a SIGNATURE INDEX, not the corpus: an
  *    exploded (band, key, doc, sh) table partitioned by
  *    (band, kb = key % [[IndexBuckets]]) — 4×16-bit bands, pigeonhole
  *    guarantees recall for Hamming ≤ 3, band-candidate filter beyond
  *    that. The per-batch probe reads ONLY the bucket dirs the batch's
  *    own keys fall in (PartitionFilters pruning), so probe bytes
  *    follow the batch's bucket fan-out, not the index size;
  *  - the drop policy is RELATIONAL, not sequential: a document is
  *    dropped iff some prior document — an earlier id inside the same
  *    microbatch, or any already-indexed document — is within
  *    `maxDist`. No order-dependent greedy chain, so the result is
  *    independent of batch boundaries AND expressible as one batch
  *    query (the oracle): kept(d) ⇔ ¬∃ e < d sharing a band with
  *    hamming(sig_e, sig_d) ≤ maxDist.
  *
  * All seen signatures are indexed (kept and dropped alike) — "similar
  * to anything seen" is the training-data contract: a near-dup of a
  * dropped document is still a near-dup of the corpus.
  */
object StreamingDedup {

  /** Key-buckets per band in the on-disk index layout: partition dirs
    * are (band, kb = key % IndexBuckets), so a microbatch probe prunes
    * the read to the buckets its own keys fall in. Probe bytes then
    * scale with the batch's bucket fan-out (≤ 4 × batch-distinct keys,
    * hard-capped at 4 × IndexBuckets dirs) times per-bucket size —
    * ~1/256 of the index each — instead of re-reading the whole index
    * every batch.
    */
  val IndexBuckets = 16

  private def banded(sigs: DataFrame): DataFrame =
    sigs.select(col("doc"), col("sh"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sh"), b * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
      .withColumn("kb", col("key") % IndexBuckets)

  /** Partition-pruned index read for a probe's (band·IndexBuckets + kb)
    * id set: band and kb are partition columns, so the `isin` lands in
    * PartitionFilters and unmatched bucket directories are never
    * listed or read. Package-private for the pruning assertion in
    * StreamingDedupSpec.
    */
  private[streaming] def probeIndex(spark: SparkSession, indexPath: String,
                                    bucketIds: Seq[Long]): DataFrame =
    spark.read.parquet(indexPath)
      .where((col("band").cast("long") * IndexBuckets +
        col("kb").cast("long")).isin(bucketIds: _*))

  /** One microbatch step: flag near-dups of prior docs, append all new
    * signatures to the index, append survivors to `outPath`. Exposed
    * for testing; [[ingest]] wires it into foreachBatch.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, textCol: String,
                   idCol: String, indexPath: String, outPath: String,
                   maxDist: Int): Unit = {
    val sigs = batch
      .select(col(idCol).as("doc"), Dedup.simhash64(col(textCol)).as("sh"))
    val newBanded = banded(sigs).localCheckpoint(true) // one UDF pass
    if (newBanded.isEmpty) {
      // an empty microbatch must write NOTHING: a zero-row partitionBy
      // append still creates the index directory, and the next batch's
      // index read then dies on schema inference over zero files
      graft.core.Pinned.release(newBanded)
      return
    }
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // within-batch: an earlier id in the same band bucket within range
    val intra = newBanded.as("a").join(newBanded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc") < col("b.doc"))
      .where(bit_count(col("a.sh").bitwiseXOR(col("b.sh"))) <= maxDist)
      .select(col("b.doc").as("doc"))

    // against the accumulated index: any prior doc within range. The
    // batch's bucket-id set is a bounded driver collect (≤ 4 ×
    // IndexBuckets = 256 values however large the batch), and feeds
    // the partition-pruned probe — only matching (band, kb) dirs read.
    val versusIndex =
      if (!fs.exists(new org.apache.hadoop.fs.Path(indexPath))) intra.limit(0)
      else {
        val bucketIds = newBanded
          .select((col("band") * IndexBuckets + col("kb")).as("p"))
          .distinct().collect().map(_.getLong(0)).toSeq
        if (bucketIds.isEmpty) intra.limit(0) // empty microbatch: no probe
        else probeIndex(spark, indexPath, bucketIds).as("i").join(newBanded.as("b"),
            col("i.band") === col("b.band") && col("i.key") === col("b.key"))
          .where(bit_count(col("i.sh").bitwiseXOR(col("b.sh"))) <= maxDist)
          .select(col("b.doc").as("doc"))
      }

    val dropped = intra.union(versusIndex).distinct().localCheckpoint(true)
    val kept = sigs.join(dropped, Seq("doc"), "left_anti").select(col("doc"))
    kept.write.mode(SaveMode.Append).parquet(outPath)
    // One file per touched (band, kb) dir per batch: repartition on the
    // partition keys first, or partitionBy fans every write task out
    // across all 256 dirs (task-count × dirs tiny files).
    newBanded.repartition(col("band"), col("kb"))
      .write.mode(SaveMode.Append)
      .partitionBy("band", "kb").parquet(indexPath)
    graft.core.Pinned.release(newBanded)
    graft.core.Pinned.release(dropped)
  }

  /** Stream the documents table through the incremental dedup; kept
    * doc ids land in `outPath`, signatures in `indexPath`. Returns
    * after the static source is fully processed.
    */
  def ingest(spark: SparkSession, dir: String, indexPath: String,
             outPath: String, maxDist: Int = 12): Unit = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stage = java.nio.file.Files.createTempDirectory("graft_sdedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      stage.resolve("documents.parquet"))
    val stream = spark.readStream.schema(schema).parquet(stage.toString)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch.sparkSession, batch, "text", "doc_id",
          indexPath, outPath, maxDist)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }
}
