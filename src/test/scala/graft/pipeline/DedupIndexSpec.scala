package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** The persisted fingerprint-index lifecycle: incremental probes
  * equal the one-shot exact-dedup rule, small-increment probes prune
  * the bucket partitions they don't touch, appends keep one file per
  * touched bucket, and compaction is contents-invariant.
  */
class DedupIndexSpec extends SparkTestBase {

  private def corpus = {
    import spark.implicits._
    // 30 docs, every third a duplicate of doc 0's text, plus a
    // cross-increment dup pair (10 <-> 25)
    (0L until 30L).map { i =>
      val text =
        if (i % 3 == 0) "the shared duplicate   body"
        else if (i == 25L) "unique text 10"
        else s"unique text $i"
      (i, text)
    }.toDF("doc_id", "text")
  }

  test("id-ordered increments replay the one-shot exact-dedup keepers") {
    val docs = corpus
    val idx = java.nio.file.Files.createTempDirectory("dedup_idx").toString
    DedupIndex.writeIndex(spark, docs.where(col("doc_id") < 10), "text",
      "doc_id", idx)
    val probes = Seq(10L -> 20L, 20L -> 30L).map { case (lo, hi) =>
      val inc = docs.where(col("doc_id") >= lo && col("doc_id") < hi)
      val out = DedupIndex.probe(spark, idx, inc, "text", "doc_id")
        .select("doc", "keep_id", "dup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      DedupIndex.appendNovel(spark, inc, "text", "doc_id", idx)
      out
    }.reduce(_ ++ _)
    // one-shot rule: keeper = global min id per fingerprint
    val oneShot = docs
      .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fpOf = docs.select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    probes.foreach { case (doc, keep, dup) =>
      assert(keep == oneShot(fpOf(doc)), s"doc $doc keeper")
      assert(dup == (keep != doc), s"doc $doc dup flag")
    }
    assert(probes.length == 20)
    // the cross-increment dup pair resolved to the earlier id
    assert(probes.find(_._1 == 25L).get._2 == 10L)
  }

  test("small-increment probe prunes untouched bucket partitions") {
    import spark.implicits._
    val docs = corpus
    val idx = java.nio.file.Files.createTempDirectory("dedup_idx_prune").toString
    DedupIndex.writeIndex(spark, docs, "text", "doc_id", idx)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      val qe = df.queryExecution
      qe.executedPlan.execute().count()
      qe.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.sum
    }
    val all = filesRead(spark.read.parquet(idx))
    val one = Seq((999L, "unique text 7")).toDF("doc_id", "text")
    val buckets = one
      .select(pmod(xxhash64(TextAnalysis.fingerprint(col("text"))),
        lit(DedupIndex.IndexBuckets.toLong)).as("b"))
      .collect().map(_.getLong(0)).toSeq
    val pruned = filesRead(spark.read.parquet(idx)
      .where(col("bucket").isInCollection(buckets)))
    assert(pruned < all, s"expected pruning: all=$all pruned=$pruned")
    // and the probe itself flags the duplicate against the index
    val out = DedupIndex.probe(spark, idx, one, "text", "doc_id")
      .collect().map(r => (r.getAs[Long]("keep_id"), r.getAs[Boolean]("dup")))
    assert(out.toSeq == Seq((7L, true)))
  }

  test("fp In filters page-prune within touched buckets") {
    import spark.implicits._
    // many distinct fps per bucket so files span MANY 512-row pages
    // (256k fps / 64 buckets = 4k rows = 8 pages per bucket) — page
    // pruning can only skip whole pages, so the pruned fraction
    // approaches 1/pages-per-bucket
    val big = spark.range(262144L).select(col("id").as("doc_id"),
      concat(lit("unique text "), col("id")).as("text"))
    val idx = java.nio.file.Files.createTempDirectory("dedup_idx_pp").toString
    DedupIndex.writeIndex(spark, big, "text", "doc_id", idx)
    // builds write default pages; COMPACTION restores the fp-sorted
    // small-page shape the probe's page pruning needs (the steady
    // state: compact-then-probe)
    DedupIndex.compactIndex(spark, idx)
    val one = Seq((99999L, "unique text 1234")).toDF("doc_id", "text")
    val fps = one.select(col("doc_id").as("doc"),
      TextAnalysis.fingerprint(col("text")).as("fp")).localCheckpoint(true)
    val buckets = fps
      .select(pmod(xxhash64(col("fp")),
        lit(DedupIndex.IndexBuckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    def scanned(df: org.apache.spark.sql.DataFrame): Long = {
      val qe = df.queryExecution
      qe.executedPlan.execute().count()
      qe.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum
    }
    val key = "spark.sql.parquet.pushdown.inFilterThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, DedupIndex.ProbeFpChunk + 1)
    try {
      val idx0 = spark.read.parquet(idx)
      val bucketOnly = scanned(
        idx0.where(graft.core.PartitionIn.inSet(idx0, "bucket", buckets)))
      val pruned = scanned(
        DedupIndex.probeIndexRead(spark, idx, fps, buckets, nFps = 1L))
      assert(pruned > 0 && pruned < bucketOnly / 2,
        s"fp filter not page-pruning: $pruned of $bucketOnly bucket rows")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    // and the probe still classifies the duplicate correctly
    val out = DedupIndex.probe(spark, idx, one, "text", "doc_id")
      .collect().map(r => (r.getAs[Long]("keep_id"), r.getAs[Boolean]("dup")))
    assert(out.toSeq == Seq((1234L, true)))
  }

  test("append keeps one file per touched bucket; compaction invariant") {
    val docs = corpus
    val idx = java.nio.file.Files.createTempDirectory("dedup_idx_compact").toString
    DedupIndex.writeIndex(spark, docs.where(col("doc_id") < 10), "text",
      "doc_id", idx)
    DedupIndex.appendNovel(spark,
      docs.where(col("doc_id") >= 10 && col("doc_id") < 20), "text",
      "doc_id", idx)
    DedupIndex.appendNovel(spark,
      docs.where(col("doc_id") >= 20), "text", "doc_id", idx)
    def files(): Seq[java.nio.file.Path] = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(idx))
      try s.iterator().asScala.filter(_.toString.endsWith(".parquet")).toList
      finally s.close()
    }
    val probe = docs.limit(0)
    def decisions() = DedupIndex.probe(spark, idx,
        corpus.where(col("doc_id") % 2 === 1), "text", "doc_id")
      .select("doc", "keep_id", "dup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1).toSeq
    val before = decisions()
    val nBefore = files().size
    DedupIndex.compactIndex(spark, idx)
    val nAfter = files().size
    assert(nAfter < nBefore,
      s"compaction must drop the append pile: $nBefore -> $nAfter")
    assert(decisions() == before, "compaction changed probe results")
    // index invariant: one row per fingerprint
    val idxDf = spark.read.parquet(idx)
    assert(idxDf.groupBy("fp").count().where(col("count") > 1).count() == 0)
    // empty increment: probe empty, append a no-op
    assert(DedupIndex.probe(spark, idx, probe, "text", "doc_id").count() == 0)
    DedupIndex.appendNovel(spark, probe, "text", "doc_id", idx)
    assert(decisions() == before)
  }

  test("deleteDocs: probe ≡ fresh build over survivors; content forgotten") {
    import spark.implicits._
    // keepers-only corpus (distinct texts) — the maintained-corpus
    // contract under which deletion is exact
    val base = (0L until 20L).map(i => (i, s"unique text $i"))
      .toDF("doc_id", "text")
    val del = base.where(col("doc_id") % 4 === 0).select(col("doc_id"))
    // the increment re-ingests some deleted content (even ids map back
    // to texts 0..4, some of them deleted keepers) plus fresh texts
    val inc = (100L until 110L).map { i =>
      (i, if (i % 2 == 0) s"unique text ${(i - 100) / 2}" else s"fresh $i")
    }.toDF("doc_id", "text")
    def probeRows(idx: String) =
      DedupIndex.probe(spark, idx, inc, "text", "doc_id")
        .select("doc", "keep_id", "dup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .sortBy(_._1).toSeq
    val idxA = java.nio.file.Files.createTempDirectory("ddel_a")
      .resolve("index").toString
    DedupIndex.writeIndex(spark, base, "text", "doc_id", idxA)
    val before = probeRows(idxA)
    DedupIndex.deleteDocs(spark, idxA, del)
    DedupIndex.compactIndex(spark, idxA)
    val after = probeRows(idxA)
    val idxB = java.nio.file.Files.createTempDirectory("ddel_b")
      .resolve("index").toString
    DedupIndex.writeIndex(spark,
      base.join(del, Seq("doc_id"), "left_anti"), "text", "doc_id", idxB)
    assert(after == probeRows(idxB),
      "post-delete probe must equal a fresh build over the survivors")
    assert(after != before, "deletion must actually change decisions")
    // right-to-be-forgotten: doc 100 re-ingests deleted keeper 0's
    // text and must now be its own novel keeper
    assert(after.find(_._1 == 100L).get == ((100L, 100L, false)))
    assert(before.find(_._1 == 100L).get == ((100L, 0L, true)))
  }

  test("probeAndAppend ≡ probe-then-appendNovel, incl. first contact") {
    val docs = corpus
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc", "fp", "keep_id", "dup").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    def indexRows(idx: String) = spark.read.parquet(idx)
      // the partition dir value infers as int — normalize for compare
      .select(col("fp"), col("doc"), col("bucket").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(x => (x._1, x._2)).toSeq
    val incs = Seq(0L -> 10L, 10L -> 20L, 20L -> 30L).map { case (lo, hi) =>
      docs.where(col("doc_id") >= lo && col("doc_id") < hi)
    }
    // separate-call reference: probe (absent on first contact — the
    // old first-batch path built then window-kept) then appendNovel
    val idxA = java.nio.file.Files.createTempDirectory("dfuse_a")
      .resolve("index").toString
    val refDecisions = incs.zipWithIndex.map { case (inc, i) =>
      val d = if (i == 0) None
        else Some(rows(DedupIndex.probe(spark, idxA, inc, "text", "doc_id")))
      if (i == 0) DedupIndex.writeIndex(spark, inc, "text", "doc_id", idxA)
      else DedupIndex.appendNovel(spark, inc, "text", "doc_id", idxA)
      d
    }
    // fused calls, first contact included
    val idxB = java.nio.file.Files.createTempDirectory("dfuse_b")
      .resolve("index").toString
    val fused = incs.map { inc =>
      val d = DedupIndex.probeAndAppend(spark, idxB, inc, "text", "doc_id")
      val out = rows(d)
      graft.core.Pinned.release(d)
      out
    }
    // same decisions on every increment the separate path probed
    refDecisions.zip(fused).foreach {
      case (Some(ref), got) => assert(got == ref, "fused decisions drifted")
      case (None, got) =>
        // first contact: every keeper is the batch's own min-id holder
        got.foreach { case (doc, _, keep, dup) =>
          assert(dup == (keep != doc))
          assert(got.exists(r => r._1 == keep && !r._4)) }
    }
    // same persisted layout, row for row (bucket included)
    assert(indexRows(idxB) == indexRows(idxA),
      "fused append must persist exactly appendNovel's layout")
  }

}
