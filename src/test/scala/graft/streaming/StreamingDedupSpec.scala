package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Incremental simhash dedup: batch-boundary independence and the
  * relational drop contract (doc dropped iff some earlier doc shares a
  * band within maxDist).
  */
class StreamingDedupSpec extends SparkTestBase {

  private def docsDf(n: Int) = {
    import spark.implicits._
    // clusters of near-identical docs: same base text with tiny edits
    (0 until n).map { i =>
      val base = s"the quick brown fox ${i / 4} jumps over the lazy dog " * 6
      val noise = if (i % 4 == 0) "" else s"variant ${i % 4}"
      (i.toLong, base + noise)
    }.toDF("doc_id", "text")
  }

  private def runBatches(batches: Seq[org.apache.spark.sql.DataFrame]): Set[Long] = {
    val root = java.nio.file.Files.createTempDirectory("sdedup_spec")
    val idx = root.resolve("idx").toString
    val out = root.resolve("out").toString
    batches.foreach(b =>
      StreamingDedup.processBatch(spark, b, "text", "doc_id", idx, out, 12))
    spark.read.parquet(out).select(col("doc"))
      .collect().map(_.getLong(0)).toSet
  }

  test("result is independent of microbatch boundaries") {
    val docs = docsDf(40).cache()
    val oneShot = runBatches(Seq(docs))
    val twoBatches = runBatches(Seq(
      docs.where(col("doc_id") < 20), docs.where(col("doc_id") >= 20)))
    val fourBatches = runBatches((0 until 4).map(k =>
      docs.where(col("doc_id") >= k * 10 && col("doc_id") < (k + 1) * 10)))
    assert(oneShot == twoBatches)
    assert(oneShot == fourBatches)
    docs.unpersist()
  }

  test("relational contract: dropped iff an earlier doc is within maxDist") {
    import graft.pipeline.Dedup
    val docs = docsDf(32).cache()
    val kept = runBatches(Seq(docs))
    // reference computation from the batch operator: any pair (d1<d2)
    // sharing a band within distance ⇒ d2 dropped
    val droppedWant = Dedup.simhashPairs(docs, "text", "doc_id", maxDist = 12)
      .select(col("d2")).distinct().collect().map(_.getLong(0)).toSet
    val all = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept == all -- droppedWant)
    docs.unpersist()
  }

  test("index probe prunes to the batch's bucket dirs, not the full index") {
    val root = java.nio.file.Files.createTempDirectory("sdedup_prune")
    val idx = root.resolve("idx").toString
    val out = root.resolve("out").toString
    // a wide first batch populates many (band, kb) buckets
    StreamingDedup.processBatch(spark, docsDf(64), "text", "doc_id",
      idx, out, 12)
    val allFiles = spark.read.parquet(idx).inputFiles.length
    // probe with 4 bucket ids that actually exist in the index — the
    // fan-out of a realistic single-doc batch
    val liveIds = spark.read.parquet(idx)
      .select((col("band").cast("long") * StreamingDedup.IndexBuckets +
        col("kb").cast("long")).as("p"))
      .distinct().orderBy(col("p")).limit(4)
      .collect().map(_.getLong(0)).toSeq
    val probe = StreamingDedup.probeIndex(spark, idx, liveIds)
    probe.collect()
    val scannedFiles = probe.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.sum
    assert(scannedFiles > 0, "probe should read the matching buckets")
    assert(scannedFiles < allFiles,
      s"probe read $scannedFiles of $allFiles index files — no pruning")
    // and the plan carries the bucket predicate as a partition filter
    val planStr = probe.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters"))
  }

  test("large-batch probe prunes per key inside buckets (sublinear in index)") {
    // The degenerate case r5 flagged: a batch whose keys cover ALL 64
    // (band, kb) dirs — partition pruning reads the index whole. With
    // key-sorted files + small pages (the writer layout) and the
    // probe's pushed per-key filters, the scan must instead stay
    // proportional to the BATCH's key fan-out, not the index size.
    val root = java.nio.file.Files.createTempDirectory("sdedup_keyprune")
    val idx = root.resolve("idx").toString
    // one large banded write (192k rows ≈ a 48k-doc batch, or a
    // compacted index) through the shipped writer
    val banded = spark.range(192000).select(
      col("id").as("doc"),
      graft.functions.HashFunctions.splitmix64(col("id"), 99L).as("sh"),
      (col("id") % 4).cast("int").as("band"),
      pmod(graft.functions.HashFunctions.splitmix64(col("id"), 7L), lit(65536L)).as("key"))
      .withColumn("kb", col("key") % StreamingDedup.IndexBuckets)
    StreamingDedup.appendIndex(banded, idx)
    val index = spark.read.parquet(idx)
    val indexRows = index.count()
    val allBuckets = index
      .select((col("band").cast("long") * StreamingDedup.IndexBuckets +
        col("kb").cast("long")).as("p")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(allBuckets.length == 4 * StreamingDedup.IndexBuckets)
    // 32 probe keys present in the index, spread across buckets
    val keys = index.select(col("key")).distinct().orderBy(col("key"))
      .collect().map(_.getLong(0)).filter(_ % 97 == 0).take(32).toSeq
    assert(keys.length == 32)
    val threshKey = "spark.sql.parquet.pushdown.inFilterThreshold"
    val prev = spark.conf.getOption(threshKey)
    spark.conf.set(threshKey, StreamingDedup.ProbeKeyChunk + 1)
    try {
      val probe = StreamingDedup.probeIndex(spark, idx, allBuckets, keys)
      val got = probe.collect()
      val scanned = probe.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum
      assert(scanned > 0 && scanned < indexRows / 3,
        s"probe scanned $scanned of $indexRows index rows — key filter not pruning")
      // and the key filter is lossless: same rows as the unfiltered
      // probe restricted to those keys
      val want = StreamingDedup.probeIndex(spark, idx, allBuckets)
        .where(col("key").isin(keys: _*)).collect()
      def rowKey(r: org.apache.spark.sql.Row) =
        (r.getLong(r.fieldIndex("doc")), r.getInt(r.fieldIndex("band")),
          r.getLong(r.fieldIndex("key")))
      assert(got.map(rowKey).toSet == want.map(rowKey).toSet)
    } finally prev match {
      case Some(v) => spark.conf.set(threshKey, v)
      case None => spark.conf.unset(threshKey)
    }
  }

  test("compaction is layout-only: same probe results, one file per dir") {
    val root = java.nio.file.Files.createTempDirectory("sdedup_compact")
    val idx = root.resolve("idx").toString
    val out = root.resolve("out").toString
    // many small appends — the shape that degrades probes (tiny files)
    (0 until 4).foreach { k =>
      StreamingDedup.processBatch(spark,
        docsDf(40).where(col("doc_id") >= k * 10 && col("doc_id") < (k + 1) * 10),
        "text", "doc_id", idx, out, 12)
    }
    val before = spark.read.parquet(idx).collect()
      .map(r => (r.getLong(r.fieldIndex("doc")), r.getInt(r.fieldIndex("band")),
        r.getLong(r.fieldIndex("key")), r.getLong(r.fieldIndex("sh")))).toSet
    val filesBefore = spark.read.parquet(idx).inputFiles.length
    StreamingDedup.compactIndex(spark, idx)
    val after = spark.read.parquet(idx).collect()
      .map(r => (r.getLong(r.fieldIndex("doc")), r.getInt(r.fieldIndex("band")),
        r.getLong(r.fieldIndex("key")), r.getLong(r.fieldIndex("sh")))).toSet
    assert(after == before)
    val filesAfter = spark.read.parquet(idx).inputFiles.length
    assert(filesAfter < filesBefore,
      s"compaction should shrink file count: $filesBefore -> $filesAfter")
    assert(filesAfter <= 4 * StreamingDedup.IndexBuckets)
    // dedup keeps working against the compacted index
    StreamingDedup.processBatch(spark,
      docsDf(50).where(col("doc_id") >= 40), "text", "doc_id", idx, out, 12)
    assert(spark.read.parquet(out).count() > 0)
  }

  test("compaction recovers a crash that left the index parked at __old") {
    val root = java.nio.file.Files.createTempDirectory("sdedup_crash")
    val idx = root.resolve("idx").toString
    val out = root.resolve("out").toString
    StreamingDedup.processBatch(spark, docsDf(20), "text", "doc_id",
      idx, out, 12)
    val before = spark.read.parquet(idx).collect()
      .map(r => (r.getLong(r.fieldIndex("doc")), r.getInt(r.fieldIndex("band")),
        r.getLong(r.fieldIndex("key")))).toSet
    // simulate a crash between the park and promote renames: the live
    // index sits at __old, nothing at idx
    val hc = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(idx)
    val fs = p.getFileSystem(hc)
    assert(fs.rename(p, new org.apache.hadoop.fs.Path(idx + "__old")))
    StreamingDedup.compactIndex(spark, idx)
    val after = spark.read.parquet(idx).collect()
      .map(r => (r.getLong(r.fieldIndex("doc")), r.getInt(r.fieldIndex("band")),
        r.getLong(r.fieldIndex("key")))).toSet
    assert(after == before, "recovery must restore and compact the parked index")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx + "__old")))
  }

  test("empty microbatches are harmless at every stage") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("sdedup_empty")
    val idx = root.resolve("idx").toString
    val out = root.resolve("out").toString
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // empty batch before ANY index exists
    StreamingDedup.processBatch(spark, empty, "text", "doc_id", idx, out, 12)
    // real batch, then another empty one probing the now-existing index
    StreamingDedup.processBatch(spark, docsDf(8), "text", "doc_id", idx, out, 12)
    StreamingDedup.processBatch(spark, empty, "text", "doc_id", idx, out, 12)
    val kept = spark.read.parquet(out).count()
    assert(kept > 0) // the real batch's survivors, empties added nothing
  }

  test("streaming ingest over the sf0.001 table matches the batch contract") {
    val d = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("sdedup_ingest")
    StreamingDedup.ingest(spark, d, root.resolve("idx").toString,
      root.resolve("out").toString, maxDist = 12)
    val kept = spark.read.parquet(root.resolve("out").toString)
      .collect().map(_.getLong(0)).toSet
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val droppedWant = graft.pipeline.Dedup
      .simhashPairs(docs, "text", "doc_id", maxDist = 12)
      .select(col("d2")).distinct().collect().map(_.getLong(0)).toSet
    val all = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept == all -- droppedWant)
  }
}
