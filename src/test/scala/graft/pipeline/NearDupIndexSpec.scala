package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The persisted MinHash-band near-dup index: incremental probes
  * union to the one-shot LSH pass, compaction is contents-invariant,
  * and a probe reads only the band cells its own keys touch.
  */
class NearDupIndexSpec extends SparkTestBase {

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("d1", "d2", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2)).toSeq

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("grown-index probes reproduce the one-shot LSH pairs exactly") {
    val oneShot = pairs(Dedup.minhashCandidatePairs(docs, "text", "doc_id",
      w = 3, bands = 16, rows = 4, threshold = 0.2))
    val idx = java.nio.file.Files.createTempDirectory("ndi")
      .resolve("index").toString
    val a = docs.where(col("doc_id") % 3 === 0)
    val b = docs.where(col("doc_id") % 3 === 1)
    val c = docs.where(col("doc_id") % 3 === 2)
    NearDupIndex.writeIndex(spark, a, "text", "doc_id", idx)
    val p0 = Dedup.minhashCandidatePairs(a, "text", "doc_id",
      w = 3, bands = 16, rows = 4, threshold = 0.2)
    val p1 = NearDupIndex.probe(spark, idx, b, "text", "doc_id",
      threshold = 0.2)
    NearDupIndex.append(spark, b, "text", "doc_id", idx)
    val p2 = NearDupIndex.probe(spark, idx, c, "text", "doc_id",
      threshold = 0.2)
    val grown = pairs(p0.unionByName(p1).unionByName(p2))
    assert(grown == oneShot)
    assert(grown.nonEmpty, "fixture must actually contain near-dups")
  }

  test("shared-shingle lifecycle equals the composed operations") {
    val a = docs.where(col("doc_id") % 3 === 0)
    val b = docs.where(col("doc_id") % 3 === 1)
    // composed: separate one-shot pass + writeIndex + probe + append
    val idx1 = java.nio.file.Files.createTempDirectory("ndi_s1")
      .resolve("index").toString
    NearDupIndex.writeIndex(spark, a, "text", "doc_id", idx1)
    val c0 = pairs(Dedup.minhashCandidatePairs(a, "text", "doc_id",
      w = 3, bands = 16, rows = 4, threshold = 0.2))
    val c1 = pairs(NearDupIndex.probe(spark, idx1, b, "text", "doc_id",
      threshold = 0.2))
    NearDupIndex.append(spark, b, "text", "doc_id", idx1)
    // fused: buildWithPairs + probeAndAppend (one shingle scan each)
    val idx2 = java.nio.file.Files.createTempDirectory("ndi_s2")
      .resolve("index").toString
    val f0 = pairs(NearDupIndex.buildWithPairs(spark, a, "text", "doc_id",
      idx2, threshold = 0.2))
    val f1 = pairs(NearDupIndex.probeAndAppend(spark, idx2, b, "text",
      "doc_id", threshold = 0.2))
    assert(f0 == c0)
    assert(f1 == c1)
    // and both indexes answer a later probe identically
    val probe = docs.where(col("doc_id") % 3 === 2)
    assert(pairs(NearDupIndex.probe(spark, idx2, probe, "text", "doc_id",
        threshold = 0.2)) ==
      pairs(NearDupIndex.probe(spark, idx1, probe, "text", "doc_id",
        threshold = 0.2)))
  }

  test("compaction is contents-invariant for probe results") {
    import spark.implicits._
    val base = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon eta"),   // near-dup of 0
      (2L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val inc = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // dup of 0
      (11L, "totally different words here entirely")
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("ndi_c")
      .resolve("index").toString
    NearDupIndex.writeIndex(spark, base, "text", "doc_id", idx)
    val before = pairs(NearDupIndex.probe(spark, idx, inc, "text", "doc_id",
      threshold = 0.3))
    NearDupIndex.compactIndex(spark, idx)
    val after = pairs(NearDupIndex.probe(spark, idx, inc, "text", "doc_id",
      threshold = 0.3))
    assert(before == after)
    assert(before.exists { case (d1, d2, _) => d1 == 0L && d2 == 10L })
    assert(!before.exists { case (d1, d2, _) => d1 == 11L || d2 == 11L })
  }

  test("empty corpora and never-written indexes are empty, not errors") {
    import spark.implicits._
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val some = Seq((1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("ndi_e")
      .resolve("index").toString
    // an empty build writes nothing; probing the never-written index
    // still classifies the increment against ITSELF
    NearDupIndex.writeIndex(spark, emptyDocs, "text", "doc_id", idx)
    val p = pairs(NearDupIndex.probe(spark, idx, some, "text", "doc_id",
      threshold = 0.5))
    assert(p.map(x => (x._1, x._2)) == Seq((1L, 2L)))
    // an empty increment probes empty and appends nothing
    assert(NearDupIndex.probe(spark, idx, emptyDocs, "text", "doc_id")
      .count() == 0)
    NearDupIndex.append(spark, emptyDocs, "text", "doc_id", idx)
    // the layout still doesn't exist — and a real build after all
    // this works from scratch
    NearDupIndex.writeIndex(spark, some, "text", "doc_id", idx)
    val q = Seq((10L, "alpha beta gamma delta")).toDF("doc_id", "text")
    assert(pairs(NearDupIndex.probe(spark, idx, q, "text", "doc_id",
      threshold = 0.5)).map(x => (x._1, x._2)) == Seq((1L, 10L), (2L, 10L)))
  }

  test("bucket In-filters page-prune within touched cells") {
    import spark.implicits._
    // enough docs that each (band, kb) cell spans MANY 512-row pages
    // (16k docs × 16 bands / 64 cells ≈ 4k rows ≈ 8 pages per cell) —
    // page pruning can only skip whole pages, so the pruned fraction
    // approaches 1/pages-per-cell
    val corpus = (0L until 16000L)
      .map(i => (i, s"doc number $i carries words w${i}a w${i}b w${i}c w${i}d"))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("ndi_pp")
      .resolve("index").toString
    NearDupIndex.writeIndex(spark, corpus, "text", "doc_id", idx)
    val one = Seq((99999L, "doc number 1234 carries words w1234a w1234b w1234c w1234d"))
      .toDF("doc_id", "text")
    val bnd = one.select(col("doc_id").as("doc"),
        TextAnalysis.shingleHashes(col("text"), 3).as("hs"))
      .select(col("doc"),
        posexplode(Dedup.minhashBandKeys(col("hs"), 16, 4, 42L)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .withColumn("kb", pmod(col("bucket"), lit(NearDupIndex.BandBuckets.toLong)))
      .localCheckpoint(true)
    val cellIds = bnd.select((col("band").cast("long") *
        NearDupIndex.BandBuckets + col("kb")).as("cell"))
      .distinct().collect().map(_.getLong(0)).toSeq
    def scanned(df: org.apache.spark.sql.DataFrame): Long = {
      val qe = df.queryExecution
      qe.executedPlan.execute().count()
      qe.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum
    }
    val threshKey = "spark.sql.parquet.pushdown.inFilterThreshold"
    val prev = spark.conf.getOption(threshKey)
    spark.conf.set(threshKey, NearDupIndex.ProbeBucketChunk + 1)
    try {
      val cellOnly = scanned(spark.read.parquet(idx + "/bands")
        .where((col("band").cast("long") * NearDupIndex.BandBuckets +
          col("kb").cast("long")).isin(cellIds: _*)))
      val pruned = scanned(
        NearDupIndex.probeBands(spark, idx, bnd, cellIds))
      assert(pruned > 0 && pruned < cellOnly / 3,
        s"bucket filter not page-pruning: $pruned of $cellOnly cell rows")
      // and the filter is lossless: the probed doc's own bands match
      val hits = NearDupIndex.probeBands(spark, idx, bnd, cellIds)
        .join(bnd.select(col("band"), col("bucket")), Seq("band", "bucket"))
        .select("doc").distinct().collect().map(_.getLong(0))
      assert(hits.contains(1234L), s"lost the true match: ${hits.toSeq}")
    } finally prev match {
      case Some(v) => spark.conf.set(threshKey, v)
      case None => spark.conf.unset(threshKey)
    }
  }

  test("probe prunes the bands read to the batch's own cells") {
    import spark.implicits._
    val base = (0L until 40L)
      .map(i => (i, s"completely unique document number $i with filler"))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("ndi_p")
      .resolve("index").toString
    NearDupIndex.writeIndex(spark, base, "text", "doc_id", idx)
    // a 1-doc probe touches ≤ bands cells of the bands × IndexBuckets
    // layout — the pruned read must list at most that many partition
    // directories' files
    val one = Seq((100L, "completely unique document number 7 with filler"))
      .toDF("doc_id", "text")
    val out = NearDupIndex.probe(spark, idx, one, "text", "doc_id",
      threshold = 0.2)
    assert(pairs(out).exists { case (d1, d2, _) => d1 == 7L && d2 == 100L })
    val allCells = new java.io.File(idx + "/bands").listFiles()
      .count(_.getName.startsWith("band="))
    assert(allCells > 0)
    // structural pruning check: the band-cell filter collapses the
    // isin to ≤ 16 cell ids (one per band of the single doc)
    val cells = Dedup.minhashBandKeys(col("hs"), 16, 4, 42L)
    val cellIds = one.select(col("doc_id").as("doc"),
        TextAnalysis.shingleHashes(col("text"), 3).as("hs"))
      .select(posexplode(cells)).select(
        (col("pos").cast("long") * NearDupIndex.BandBuckets +
          pmod(col("col"), lit(NearDupIndex.BandBuckets.toLong))).as("cell"))
      .distinct().collect().map(_.getLong(0)).toSeq
    assert(cellIds.size <= 16) // one (band, kb) cell per band
    // and the pruning is REAL: the probe's cell filter shape reads
    // strictly fewer files than the full bands layout (the
    // DedupIndexSpec numFiles pattern)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      val qe = df.queryExecution
      qe.executedPlan.execute().count()
      qe.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.sum
    }
    val all = filesRead(spark.read.parquet(idx + "/bands"))
    val pruned = filesRead(spark.read.parquet(idx + "/bands")
      .where((col("band").cast("long") * NearDupIndex.BandBuckets +
        col("kb").cast("long")).isin(cellIds: _*)))
    assert(pruned < all, s"expected cell pruning: all=$all pruned=$pruned")
  }

  test("deleteDocs: probe ≡ fresh build over survivors; decoys forgotten") {
    val a = docs.where(col("doc_id") % 3 === 0)
    val b = docs.where(col("doc_id") % 3 === 1)
    // plant a decoy: a verbatim copy of a b doc inside the index —
    // jac 1.0 with its original, so an undeleted decoy MUST emit a
    // pair (deterministic teeth for the deletion)
    val decoy = b.limit(1).select((col("doc_id") + 7777777L).as("doc_id"),
      col("text"))
    val decoyId = decoy.head().getLong(0)
    def probePairs(idx: String) =
      pairs(NearDupIndex.probe(spark, idx, b, "text", "doc_id",
        threshold = 0.2))
    val idxA = java.nio.file.Files.createTempDirectory("nddel_a")
      .resolve("index").toString
    NearDupIndex.writeIndex(spark, a.unionByName(decoy), "text", "doc_id",
      idxA)
    val before = probePairs(idxA)
    assert(before.exists(p => p._1 == decoyId || p._2 == decoyId),
      "undeleted decoy must pair with its original")
    NearDupIndex.deleteDocs(spark, idxA,
      decoy.select(col("doc_id"))
        .unionByName(a.where(col("doc_id") % 9 === 0).select(col("doc_id"))))
    NearDupIndex.compactIndex(spark, idxA)
    val after = probePairs(idxA)
    val idxB = java.nio.file.Files.createTempDirectory("nddel_b")
      .resolve("index").toString
    NearDupIndex.writeIndex(spark, a.where(col("doc_id") % 9 =!= 0),
      "text", "doc_id", idxB)
    assert(after == probePairs(idxB),
      "post-delete probe must equal a fresh build over the survivors")
    assert(!after.exists(p => p._1 == decoyId || p._2 == decoyId))
  }

}
