package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** EmbedDedupIndex contracts: the incremental pair set equals the
  * one-shot blocked pass under ANY disjoint slicing, and probes read
  * only the cells the batch's signatures fall in.
  */
class EmbedDedupIndexSpec extends SparkTestBase {

  private def emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def oneShot(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    Dedup.cosinePairsBlocked(
        df.select(col("vec_id"), col("embedding"),
          Similarity.hyperplaneSig(col("embedding"), 64, bits = 8)
            .as("bucket")),
        "embedding", "vec_id", "bucket", threshold = 0.3)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("incremental pair set equals one-shot under different slicings") {
    val e = emb
    val want = oneShot(e)
    def grown(slices: Seq[org.apache.spark.sql.DataFrame],
              compactAt: Int): Set[(Long, Long)] = {
      val path = java.nio.file.Files.createTempDirectory("edi")
        .resolve("index").toString
      val pairs = slices.zipWithIndex.map { case (sl, i) =>
        val p =
          if (i == 0) EmbedDedupIndex.buildWithPairs(spark, sl,
            "embedding", "vec_id", path, dim = 64, bits = 8)
          else EmbedDedupIndex.probeAndAppend(spark, path, sl,
            "embedding", "vec_id", dim = 64, bits = 8)
        if (i == compactAt) EmbedDedupIndex.compactIndex(spark, path)
        p.select("d1", "d2").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      pairs.reduce(_ ++ _)
    }
    // id-ordered halves and round-robin thirds must both reproduce it
    assert(grown(Seq(e.where(col("vec_id") < 250),
      e.where(col("vec_id") >= 250)), compactAt = 0) == want)
    assert(grown(Seq(e.where(col("vec_id") % 3 === 0),
      e.where(col("vec_id") % 3 === 1),
      e.where(col("vec_id") % 3 === 2)), compactAt = 1) == want)
  }

  test("probes read only the batch's signature cells") {
    val e = emb
    val path = java.nio.file.Files.createTempDirectory("edi_pr")
      .resolve("index").toString
    EmbedDedupIndex.buildWithPairs(spark, e.where(col("vec_id") >= 10),
      "embedding", "vec_id", path, dim = 64, bits = 8)
    EmbedDedupIndex.compactIndex(spark, path)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      val qe = df.queryExecution
      qe.executedPlan.execute().count()
      qe.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.sum
    }
    val idx = spark.read.parquet(path)
    val all = filesRead(idx)
    // a small probe's kb set is a handful of the 64 cells
    val probeKbs = e.where(col("vec_id") < 3)
      .select(pmod(Similarity.hyperplaneSig(col("embedding"), 64, 8),
        lit(EmbedDedupIndex.Cells.toLong)).as("kb"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val pruned = filesRead(idx.where(
      graft.core.PartitionIn.inSet(idx, "kb", probeKbs)))
    assert(pruned < all,
      s"kb filter must cut files read: all=$all pruned=$pruned")
  }

  test("deleteDocs: probe ≡ fresh build over survivors; decoys forgotten") {
    val e = emb
    val a = e.where(col("vec_id") % 3 === 0)
    val b = e.where(col("vec_id") % 3 === 1)
    // decoy: a verbatim copy of a b vector (cosine 1.0) — an
    // undeleted decoy must emit a pair with its original
    val decoy = b.limit(1).select((col("vec_id") + 7777777L).as("vec_id"),
      col("embedding"))
    val decoyId = decoy.head().getLong(0)
    def probePairs(idx: String) =
      EmbedDedupIndex.probeAndAppend(spark, idx, b, "embedding", "vec_id",
          dim = 64, bits = 8)
        .select("d1", "d2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val idxA = java.nio.file.Files.createTempDirectory("edel_a")
      .resolve("index").toString
    EmbedDedupIndex.buildWithPairs(spark, a.unionByName(decoy),
      "embedding", "vec_id", idxA, dim = 64, bits = 8)
    EmbedDedupIndex.deleteDocs(spark, idxA,
      decoy.select(col("vec_id"))
        .unionByName(a.where(col("vec_id") % 9 === 0).select(col("vec_id"))))
    EmbedDedupIndex.compactIndex(spark, idxA)
    val after = probePairs(idxA)
    val idxB = java.nio.file.Files.createTempDirectory("edel_b")
      .resolve("index").toString
    EmbedDedupIndex.buildWithPairs(spark, a.where(col("vec_id") % 9 =!= 0),
      "embedding", "vec_id", idxB, dim = 64, bits = 8)
    assert(after == probePairs(idxB),
      "post-delete probe must equal a fresh build over the survivors")
    assert(!after.exists(p => p._1 == decoyId || p._2 == decoyId))
    // and on an UNDELETED clone the decoy pair is present (teeth)
    val idxC = java.nio.file.Files.createTempDirectory("edel_c")
      .resolve("index").toString
    EmbedDedupIndex.buildWithPairs(spark, a.unionByName(decoy),
      "embedding", "vec_id", idxC, dim = 64, bits = 8)
    val withDecoy = probePairs(idxC)
    assert(withDecoy.exists(p => p._1 == decoyId || p._2 == decoyId),
      "undeleted decoy must pair with its original")
  }

}
