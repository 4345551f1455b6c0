package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Cluster-balanced sampling contracts: the quota binds per cluster,
  * small clusters survive whole, selection is a pure function of
  * (id, seed, model) — partition-invariant and seed-sensitive — and
  * the heap path agrees with the window formulation it replaces.
  */
class CurationSampleSpec extends SparkTestBase {

  // two well-separated clusters: 8 vecs near (1,0), 3 near (0,1)
  private def embDf = {
    import spark.implicits._
    val near = (0 until 8).map(i =>
      (i.toLong, Array(1.0f, 0.001f * i)))
    val far = (8 until 11).map(i =>
      (i.toLong, Array(0.001f * i, 1.0f)))
    (near ++ far).toDF("vec_id", "embedding")
  }

  private def fit() =
    Ivf.train(embDf, "embedding", "vec_id", nlist = 2, iters = 3)

  test("quota binds on big clusters, small clusters survive whole") {
    val m = fit()
    val out = Curation.clusterBalancedSample(embDf, "embedding", "vec_id",
      m, quota = 4).collect()
    val byCluster = out.groupBy(_.get(0)).view.mapValues(_.length).toMap
    assert(byCluster.values.toSet.subsetOf(Set(3, 4)),
      s"expected counts {3,4}, got $byCluster")
    assert(byCluster.values.sum == 7) // 4 of 8 + all 3
  }

  test("selection is partition-invariant and deterministic") {
    val m = fit()
    def run(parts: Int) = Curation.clusterBalancedSample(
        embDf.repartition(parts), "embedding", "vec_id", m, quota = 4)
      .orderBy(col("cluster"), col("vec_id"))
      .collect().map(r => (r.get(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(run(1) == run(7))
    assert(run(3) == run(3))
  }

  test("seed changes the surviving set") {
    val m = fit()
    def ids(seed: Long) = Curation.clusterBalancedSample(embDf, "embedding",
      "vec_id", m, quota = 4, seed = seed).collect().map(_.getLong(1)).toSet
    val draws = (1L to 8L).map(ids)
    assert(draws.distinct.size > 1, "8 seeds should not all agree")
  }

  test("heap path equals the window row_number formulation") {
    val m = fit()
    val assigned = Ivf.assign(embDf, "embedding", m)
      .select(col("cluster"), col("vec_id"),
        graft.functions.HashFunctions.unitUniform(col("vec_id"), 42L).as("u"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("u"), col("vec_id"))
    val viaWindow = assigned.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 4).select("cluster", "vec_id", "u")
      .orderBy(col("cluster"), col("vec_id"))
      .collect().map(r => (r.get(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaHeap = Curation.clusterBalancedSample(embDf, "embedding",
        "vec_id", m, quota = 4)
      .orderBy(col("cluster"), col("vec_id"))
      .collect().map(r => (r.get(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaHeap == viaWindow)
  }
}
