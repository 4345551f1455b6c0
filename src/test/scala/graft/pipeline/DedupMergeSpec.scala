package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Segment-merge contracts for the dedup index family — the
  * shard-parallel build topology: each shard indexed concurrently,
  * then absorbed by [[DedupIndex.mergeInto]] /
  * [[NearDupIndex.mergeInto]] / [[PHashIndex.mergeInto]] /
  * [[EmbedDedupIndex.mergeInto]]. Pinned per family: src consumed
  * wholesale, the emitted CROSS-SHARD report equals what the
  * sequential lifecycle would have reported, post-merge probes equal
  * probes against a sequentially-grown index, and (pairs ∪ report)
  * reconstructs the one-shot pass over the union. Plus file-level
  * crash idempotence on the moved layout.
  */
class DedupMergeSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    .select(col("doc_id"), col("text"))

  private def jp(df: org.apache.spark.sql.DataFrame) =
    df.select("d1", "d2", "jac").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(p => (p._1, p._2)).toSeq

  test("DedupIndex.mergeInto: report = sequential probe of src corpus " +
      "restricted to src keepers; merged probe = sequential probe") {
    val a = docs.where(col("doc_id") % 3 === 0)
    // shard B carries verbatim copies of five shard-A texts (fresh
    // ids) — guaranteed cross-shard exact dups, deterministic teeth
    val b = docs.where(col("doc_id") % 3 === 1).unionByName(
      a.orderBy(col("doc_id")).limit(5)
        .select((col("doc_id") + 900001L).as("doc_id"), col("text")))
    val c = docs.where(col("doc_id") % 3 === 2)
    val base = java.nio.file.Files.createTempDirectory("fp_merge")
    val seqIdx = base.resolve("seq").toString
    val shardA = base.resolve("a").toString
    val shardB = base.resolve("b").toString
    DedupIndex.writeIndex(spark, a, "text", "doc_id", seqIdx)
    DedupIndex.writeIndex(spark, a, "text", "doc_id", shardA)
    DedupIndex.writeIndex(spark, b, "text", "doc_id", shardB)
    // expected report: probe B's corpus against pre-merge A,
    // restricted to B's own keepers (B-internal dups were B's affair)
    val bKeepers = spark.read.parquet(shardB)
      .select(col("doc")).collect().map(_.getLong(0)).toSet
    val expect = DedupIndex.probe(spark, shardA, b, "text", "doc_id")
      .select("doc", "keep_id", "dup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .filter(t => bKeepers.contains(t._1)).toSet
    val got = DedupIndex.mergeInto(spark, shardA, shardB)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assert(got == expect)
    assert(got.exists(_._3), "fixture must exercise cross-shard dups")
    assert(!java.nio.file.Files.exists(java.nio.file.Path.of(shardB)),
      "src shard must be consumed")
    // merged index ≡ sequentially-grown index for every later probe
    DedupIndex.appendNovel(spark, b, "text", "doc_id", seqIdx)
    def decisions(p: String) =
      DedupIndex.probe(spark, p, c, "text", "doc_id")
        .select("doc", "keep_id", "dup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(decisions(shardA) == decisions(seqIdx))
  }

  test("DedupIndex empty-layout contract: empty builds write nothing, " +
      "probes treat missing layouts as empty, data-less shards merge") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("fp_empty")
    val never = base.resolve("never").toString
    // empty corpus: no directory, no schema-inference landmine
    DedupIndex.writeIndex(spark, docs.limit(0), "text", "doc_id", never)
    assert(!java.nio.file.Files.exists(java.nio.file.Path.of(never)))
    // probe before any build: every doc classifies against the batch
    val one = Seq((5L, "alpha"), (9L, "alpha")).toDF("doc_id", "text")
    val got = DedupIndex.probe(spark, never, one, "text", "doc_id")
      .select("doc", "keep_id", "dup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == Set((5L, 5L, false), (9L, 5L, true)))
    // merging a data-less src consumes it and reports nothing
    val a = base.resolve("a").toString
    DedupIndex.writeIndex(spark, docs.where(col("doc_id") < 50), "text",
      "doc_id", a)
    assert(DedupIndex.mergeInto(spark, a, never).isEmpty)
    // merging INTO a data-less-but-existing dst: all src fps novel
    val b = base.resolve("b").toString
    val hollow = base.resolve("hollow").toString
    java.nio.file.Files.createDirectories(java.nio.file.Path.of(hollow))
    DedupIndex.writeIndex(spark, docs.where(col("doc_id") < 50), "text",
      "doc_id", b)
    val report = DedupIndex.mergeInto(spark, hollow, b)
    assert(report.collect().forall(!_.getBoolean(2)), "all novel")
    val reingested = docs.where(col("doc_id") < 50)
      .select((col("doc_id") + 777000L).as("doc_id"), col("text"))
    val probe = DedupIndex.probe(spark, hollow, reingested, "text",
        "doc_id").collect()
    assert(probe.nonEmpty && probe.forall(_.getAs[Boolean]("dup")),
      "the moved fps must now suppress re-ingests")
  }

  test("NearDupIndex.mergeInto: shard pairs ∪ cross report ∪ later " +
      "probe = one-shot LSH pass; src consumed") {
    val a = docs.where(col("doc_id") % 3 === 0)
    val b = docs.where(col("doc_id") % 3 === 1)
    val c = docs.where(col("doc_id") % 3 === 2)
    val want = jp(Dedup.minhashCandidatePairs(docs, "text", "doc_id",
      w = 3, bands = 16, rows = 4, threshold = 0.2))
    assert(want.nonEmpty)
    val base = java.nio.file.Files.createTempDirectory("nd_merge")
    val shardA = base.resolve("a").toString
    val shardB = base.resolve("b").toString
    val p0 = jp(NearDupIndex.buildWithPairs(spark, a, "text", "doc_id",
      shardA, threshold = 0.2))
    val p1 = jp(NearDupIndex.buildWithPairs(spark, b, "text", "doc_id",
      shardB, threshold = 0.2))
    val cross = jp(NearDupIndex.mergeInto(spark, shardA, shardB,
      threshold = 0.2))
    assert(cross.nonEmpty, "fixture must exercise cross-shard pairs")
    assert(!java.nio.file.Files.exists(java.nio.file.Path.of(shardB)))
    NearDupIndex.compactIndex(spark, shardA)
    val p2 = jp(NearDupIndex.probe(spark, shardA, c, "text", "doc_id",
      threshold = 0.2))
    assert((p0 ++ p1 ++ cross ++ p2).sortBy(p => (p._1, p._2)) == want)
  }

  test("PHashIndex.mergeInto: shard pairs ∪ cross report ∪ later probe " +
      "= one-shot banded pass; crash mid-move re-runs to completion") {
    val media = Multimodal.synthetic(spark, 60)
      .where(col("kind") === "image")
    val corpus = media.unionByName(
      Multimodal.resizeImages(media, 8, 6)
        .select((col("id") + 1000L).as("id"), col("kind"), col("bytes"),
          col("width"), col("height"), col("durationMs")))
    def pp(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sortBy(p => (p._1, p._2)).toSeq
    val want = pp(Multimodal.imageNearDupPairs(corpus, "bytes", "id",
      maxDist = 6, bands = 8))
    assert(want.nonEmpty)
    val a = corpus.where(col("id") % 3 === 0)
    val b = corpus.where(col("id") % 3 === 1)
    val c = corpus.where(col("id") % 3 === 2)
    val base = java.nio.file.Files.createTempDirectory("ph_merge")
    val shardA = base.resolve("a").toString
    val shardB = base.resolve("b").toString
    val p0 = pp(PHashIndex.buildWithPairs(spark, a, "bytes", "id", shardA,
      maxDist = 6))
    val p1 = pp(PHashIndex.buildWithPairs(spark, b, "bytes", "id", shardB,
      maxDist = 6))
    // simulate a crashed earlier merge: one partition file already
    // moved by hand — the re-run must verify and move the remainder
    val bDir = new java.io.File(shardB)
    val cell = bDir.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("band=")).head
    val kb = cell.listFiles().filter(_.isDirectory).head
    val pf = kb.listFiles().filter(_.getName.endsWith(".parquet")).head
    val tgt = java.nio.file.Path.of(shardA, cell.getName, kb.getName,
      pf.getName)
    java.nio.file.Files.createDirectories(tgt.getParent)
    assert(pf.renameTo(tgt.toFile))
    val cross = pp(PHashIndex.mergeInto(spark, shardA, shardB, maxDist = 6))
    assert(!java.nio.file.Files.exists(java.nio.file.Path.of(shardB)))
    PHashIndex.compactIndex(spark, shardA)
    val p2 = pp(PHashIndex.probe(spark, shardA, c, "bytes", "id",
      maxDist = 6))
    // the hand-moved file turned some cross pairs into "already in
    // dst" band collisions — mergeInto still reports them (its join
    // sees them on the dst side), so the union must still be exact
    assert((p0 ++ p1 ++ cross ++ p2).distinct.sortBy(p => (p._1, p._2))
      == want)
  }

  test("EmbedDedupIndex.mergeInto: shard pairs ∪ cross report ∪ later " +
      "probe = one-shot blocked pass; src consumed") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def sp(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = sp(Dedup.cosinePairsBlocked(
      emb.select(col("vec_id"), col("embedding"),
        Similarity.hyperplaneSig(col("embedding"), 64, bits = 8)
          .as("bucket")),
      "embedding", "vec_id", "bucket", threshold = 0.3))
    assert(want.nonEmpty)
    val a = emb.where(col("vec_id") % 3 === 0)
    val b = emb.where(col("vec_id") % 3 === 1)
    val c = emb.where(col("vec_id") % 3 === 2)
    val base = java.nio.file.Files.createTempDirectory("ed_merge")
    val shardA = base.resolve("a").toString
    val shardB = base.resolve("b").toString
    val p0 = sp(EmbedDedupIndex.buildWithPairs(spark, a, "embedding",
      "vec_id", shardA, dim = 64, bits = 8))
    val p1 = sp(EmbedDedupIndex.buildWithPairs(spark, b, "embedding",
      "vec_id", shardB, dim = 64, bits = 8))
    val cross = sp(EmbedDedupIndex.mergeInto(spark, shardA, shardB))
    assert(!java.nio.file.Files.exists(java.nio.file.Path.of(shardB)))
    EmbedDedupIndex.compactIndex(spark, shardA)
    val p2 = sp(EmbedDedupIndex.probeAndAppend(spark, shardA, c,
      "embedding", "vec_id", dim = 64, bits = 8))
    assert((p0 ++ p1 ++ cross ++ p2) == want)
  }
}
