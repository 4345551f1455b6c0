package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Range-search contracts the direct-SQL gate rows can't check: the
  * radius bound actually PRUNES cluster directories on a corpus with
  * cluster structure (the fixture embeddings are near-uniform, so
  * the gate rows only pin exactness), pruning never costs a result
  * (exact vs brute force on the clustered fixture), and a missing
  * radius sidecar degrades to admit-everything, never to a wrong
  * answer.
  */
class RangeSearchSpec extends SparkTestBase {

  /** 8 tight clusters on the 16-sphere: center e_i, members center +
    * deterministic small noise, renormalized. Radii ≈ noise scale —
    * far below the sphere diameter, so the bound has teeth.
    */
  private def clustered = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 16
    val rows = for {
      c <- 0 until 8
      m <- 0 until 40
    } yield {
      val v = Array.tabulate(dim)(j =>
        (if (j == c * 2) 1.0 else 0.0) + rnd.nextGaussian() * 0.05)
      val n = math.sqrt(v.map(x => x * x).sum)
      ((c * 40 + m).toLong, v.map(x => (x / n).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  private def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
    val qe = df.queryExecution
    qe.executedPlan.execute().count()
    qe.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.sum
  }

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("the radius bound prunes cluster dirs on a clustered corpus, " +
      "and the pruned result is still brute-force exact") {
    import graft.functions.VectorFunctions.cosineSimD
    val emb = clustered.localCheckpoint(true)
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 4)
    val idx = java.nio.file.Files.createTempDirectory("range_clustered")
      .resolve("index").toString
    val assigned = Ivf.assign(emb, "embedding", model)
    Ivf.writeIndex(assigned, idx)
    RangeSearch.appendRadii(spark, assigned, "embedding", model, idx)
    val q = emb.where(col("vec_id") < 2) // two members of cluster 0
    val res = RangeSearch.search(spark, idx, q, "embedding", "vec_id",
      model, tau = 0.8)
    val all = filesRead(spark.read.parquet(idx))
    val read = filesRead(res)
    assert(read < all, s"expected cluster pruning: read=$read all=$all")
    // exact vs brute force
    val brute = emb.as("a").crossJoin(q.select(
        col("vec_id").as("qid"), col("embedding").as("qv")))
      .where(col("a.vec_id") =!= col("qid"))
      .select(col("qid"), col("a.vec_id").as("nid"),
        cosineSimD(col("a.embedding"), col("qv")).as("sim"))
      .where(col("sim") >= 0.8)
    assert(pairs(res) == pairs(brute) && pairs(res).nonEmpty)
    graft.core.Pinned.release(emb)
  }

  test("a missing radius sidecar admits every cluster — exact, unpruned") {
    import graft.functions.VectorFunctions.cosineSimD
    val emb = clustered.localCheckpoint(true)
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 4)
    val idx = java.nio.file.Files.createTempDirectory("range_nosidecar")
      .resolve("index").toString
    Ivf.writeIndex(Ivf.assign(emb, "embedding", model), idx)
    val q = emb.where(col("vec_id") < 2)
    val res = RangeSearch.search(spark, idx, q, "embedding", "vec_id",
      model, tau = 0.8)
    val brute = emb.as("a").crossJoin(q.select(
        col("vec_id").as("qid"), col("embedding").as("qv")))
      .where(col("a.vec_id") =!= col("qid"))
      .select(col("qid"), col("a.vec_id").as("nid"),
        cosineSimD(col("a.embedding"), col("qv")).as("sim"))
      .where(col("sim") >= 0.8)
    assert(pairs(res) == pairs(brute) && pairs(res).nonEmpty)
    graft.core.Pinned.release(emb)
  }

  test("an impossible threshold prunes everything and returns empty") {
    val emb = clustered.localCheckpoint(true)
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 4)
    val idx = java.nio.file.Files.createTempDirectory("range_none")
      .resolve("index").toString
    val assigned = Ivf.assign(emb, "embedding", model)
    Ivf.writeIndex(assigned, idx)
    RangeSearch.appendRadii(spark, assigned, "embedding", model, idx)
    // tau = 1 admits only exact duplicates; the fixture has none, and
    // with tight radii most cells are pruned before any read
    val res = RangeSearch.search(spark,
      idx, emb.where(col("vec_id") === 0L), "embedding", "vec_id",
      model, tau = 0.99999)
    assert(res.isEmpty)
    graft.core.Pinned.release(emb)
  }
}
