package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Persisted perceptual-hash index contracts: incremental probes
  * union to the one-shot banded pass under different slicings,
  * deletion ≡ a fresh build over survivors (with decoy teeth), and
  * the streaming twin's kept set follows the relational drop rule.
  */
class PHashIndexSpec extends SparkTestBase {

  private def corpus = {
    val media = Multimodal.synthetic(spark, 60)
      .where(col("kind") === "image")
    media.unionByName(
      Multimodal.resizeImages(media, 8, 6)
        .select((col("id") + 1000L).as("id"), col("kind"), col("bytes"),
          col("width"), col("height"), col("durationMs")))
  }

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("d1", "d2", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .sortBy(p => (p._1, p._2)).toSeq

  test("incremental pair set equals one-shot under different slicings") {
    val c = corpus
    val want = pairs(Multimodal.imageNearDupPairs(c, "bytes", "id",
      maxDist = 6, bands = 8))
    assert(want.nonEmpty)
    def grown(slices: Seq[org.apache.spark.sql.DataFrame],
              compactAt: Int): Seq[(Long, Long, Int)] = {
      val path = java.nio.file.Files.createTempDirectory("phx")
        .resolve("index").toString
      slices.zipWithIndex.flatMap { case (sl, i) =>
        val p =
          if (i == 0) PHashIndex.buildWithPairs(spark, sl, "bytes", "id",
            path, maxDist = 6)
          else PHashIndex.probeAndAppend(spark, path, sl, "bytes", "id",
            maxDist = 6)
        if (i == compactAt) PHashIndex.compactIndex(spark, path)
        pairs(p)
      }.sortBy(p => (p._1, p._2))
    }
    assert(grown(Seq(c.where(col("id") < 500), c.where(col("id") >= 500)),
      compactAt = 0) == want)
    assert(grown(Seq(c.where(col("id") % 3 === 0),
      c.where(col("id") % 3 === 1), c.where(col("id") % 3 === 2)),
      compactAt = 1) == want)
  }

  test("deleteDocs: probe ≡ fresh build over survivors; decoys forgotten") {
    val c = corpus
    val a = c.where(col("id") % 2 === 0)
    val b = c.where(col("id") % 2 === 1)
    // decoys: verbatim copies of b images — dist 0 with their
    // originals, deterministic teeth
    val decoys = b.limit(3).select((col("id") + 7777777L).as("id"),
      col("kind"), col("bytes"), col("width"), col("height"),
      col("durationMs"))
    val idxA = java.nio.file.Files.createTempDirectory("phx_da")
      .resolve("index").toString
    PHashIndex.writeIndex(spark, a.unionByName(decoys), "bytes", "id", idxA)
    val before = pairs(PHashIndex.probe(spark, idxA, b, "bytes", "id",
      maxDist = 6))
    assert(before.exists(p => p._1 >= 7777777L || p._2 >= 7777777L),
      "undeleted decoys must pair with their originals")
    PHashIndex.deleteDocs(spark, idxA, decoys.select(col("id")))
    val after = pairs(PHashIndex.probe(spark, idxA, b, "bytes", "id",
      maxDist = 6))
    val idxB = java.nio.file.Files.createTempDirectory("phx_db")
      .resolve("index").toString
    PHashIndex.writeIndex(spark, a, "bytes", "id", idxB)
    assert(after == pairs(PHashIndex.probe(spark, idxB, b, "bytes", "id",
      maxDist = 6)))
    assert(!after.exists(p => p._1 >= 7777777L || p._2 >= 7777777L))
  }

  test("streaming ingest keeps exactly the nobody's-later-near-dup set") {
    val c = corpus.localCheckpoint(true)
    val want = {
      val dropped = Multimodal.imageNearDupPairs(c, "bytes", "id",
          maxDist = 6, bands = 8)
        .select("d2").collect().map(_.getLong(0)).toSet
      c.select("id").collect().map(_.getLong(0))
        .filterNot(dropped).sorted.toSeq
    }
    val root = java.nio.file.Files.createTempDirectory("phx_s")
    val src = root.resolve("media").toString
    c.write.parquet(src)
    val idx = root.resolve("index").toString
    val out = root.resolve("kept").toString
    graft.streaming.StreamingImageDedup.ingest(spark, src, idx, out,
      maxDist = 6, nBatches = 3, compactEvery = 2)
    val got = spark.read.parquet(out)
      .select("doc").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    assert(got.size < c.count(), "some images must actually be dropped")
    graft.core.Pinned.release(c)
  }
}
