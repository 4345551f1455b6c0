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

  test("docFilter equals brute force over the filtered corpus, prune intact") {
    import graft.functions.VectorFunctions.cosineSimD
    val emb = clustered.localCheckpoint(true)
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 4)
    val idx = java.nio.file.Files.createTempDirectory("range_filtered")
      .resolve("index").toString
    val assigned = Ivf.assign(emb, "embedding", model)
    Ivf.writeIndex(assigned, idx)
    RangeSearch.appendRadii(spark, assigned, "embedding", model, idx)
    val q = emb.where(col("vec_id") < 2)
    val res = RangeSearch.search(spark, idx, q, "embedding", "vec_id",
      model, tau = 0.8, docFilter = Some(col("vec_id") % 2 === 0))
    // the prune still fires (filter sits below the radius cut)
    assert(filesRead(res) < filesRead(spark.read.parquet(idx)))
    val brute = emb.where(col("vec_id") % 2 === 0).as("a").crossJoin(
        q.select(col("vec_id").as("qid"), col("embedding").as("qv")))
      .where(col("a.vec_id") =!= col("qid"))
      .select(col("qid"), col("a.vec_id").as("nid"),
        cosineSimD(col("a.embedding"), col("qv")).as("sim"))
      .where(col("sim") >= 0.8)
    assert(pairs(res) == pairs(brute) && pairs(res).nonEmpty)
    graft.core.Pinned.release(emb)
  }

  test("mergeInto carries the src radius sidecar — the merged bound stays sound") {
    import graft.functions.VectorFunctions.cosineSimD
    // shard A: the tight clustered fixture (small recorded radii).
    // shard B: deterministic BRIDGE vectors m_c = unit(0.48·e_0 +
    // 0.52·e_2c) — each assigned to cluster c (nearer its centroid
    // than cluster 0's) yet within the tau = 0.6 ball of a cluster-0
    // query (cos ≈ 0.678). Their distance from centroid c (≈ 0.73)
    // dwarfs A's radii (≈ 0.1), so under A-only radii the admission
    // test ‖q−ĉ_c‖ ≈ 1.41 > d_max + r prunes cell c (0.89 + 0.1)
    // and silently drops the bridges — exactly what a merge that
    // discards src's sidecar would do; with B's radii carried the
    // cell admits (0.89 + 0.73 > 1.41) and the result is brute-exact.
    import spark.implicits._
    val dim = 16
    val a = clustered.localCheckpoint(true)
    val b = (1 to 7).map { c =>
      val v = Array.tabulate(dim)(j =>
        (if (j == 0) 0.48 else 0.0) + (if (j == c * 2) 0.52 else 0.0))
      val n = math.sqrt(v.map(x => x * x).sum)
      ((1000 + c).toLong, v.map(x => (x / n).toFloat))
    }.toDF("vec_id", "embedding").localCheckpoint(true)
    val model = Ivf.train(a, "embedding", "vec_id", nlist = 8, iters = 4)
    val base = java.nio.file.Files.createTempDirectory("range_merge")
    val idxA = base.resolve("a").toString
    val idxB = base.resolve("b").toString
    val asgA = Ivf.assign(a, "embedding", model)
    val asgB = Ivf.assign(b, "embedding", model)
    Ivf.writeIndex(asgA, idxA)
    Ivf.writeIndex(asgB, idxB)
    RangeSearch.appendRadii(spark, asgA, "embedding", model, idxA)
    RangeSearch.appendRadii(spark, asgB, "embedding", model, idxB)
    Ivf.saveModel(spark, model, Ivf.modelPath(idxA))
    Ivf.saveModel(spark, model, Ivf.modelPath(idxB))
    Ivf.mergeInto(spark, idxA, idxB)
    val union = a.unionByName(b)
    val q = a.where(col("vec_id") < 2)
    val res = RangeSearch.search(spark, idxA, q, "embedding", "vec_id",
      model, tau = 0.6)
    val brute = union.as("u").crossJoin(q.select(
        col("vec_id").as("qid"), col("embedding").as("qv")))
      .where(col("u.vec_id") =!= col("qid"))
      .select(col("qid"), col("u.vec_id").as("nid"),
        cosineSimD(col("u.embedding"), col("qv")).as("sim"))
      .where(col("sim") >= 0.6)
    assert(pairs(res) == pairs(brute),
      "merged range search must equal brute force over the union — " +
        "a dropped src sidecar silently loses far-from-centroid hits")
    // the test only bites if the bridges both qualify and live in
    // cells the A-only radii would prune — check the fixture does
    assert(pairs(brute).exists(_._2 >= 1000L),
      "fixture must place qualifying hits in the bridge shard")
    graft.core.Pinned.release(a)
    graft.core.Pinned.release(b)
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
