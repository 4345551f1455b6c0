package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** PCA contracts: orthonormal basis, eigenvalue ordering, projection
  * variance ordering on real embeddings, planted-structure recovery,
  * determinism, codegen parity.
  */
class PcaSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("basis is orthonormal, eigenvalues descending and non-negative") {
    val m = Pca.train(emb, "embedding", "vec_id", k = 8)
    for (i <- 0 until m.k; j <- i until m.k) {
      val dot = m.basis(i).zip(m.basis(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"basis($i)·basis($j) = $dot")
    }
    assert(m.eigenvalues.zip(m.eigenvalues.tail).forall { case (a, b) => a >= b })
    assert(m.eigenvalues.forall(_ >= -1e-12))
    // deterministic across invocations
    val m2 = Pca.train(emb, "embedding", "vec_id", k = 8)
    assert(m.basis.map(_.toSeq).toSeq == m2.basis.map(_.toSeq).toSeq)
  }

  test("projected component variances follow the eigenvalues") {
    val m = Pca.train(emb, "embedding", "vec_id", k = 4)
    val proj = emb.select(Pca.project(col("embedding"), m).as("p"))
      .collect().map(_.getSeq[Double](0))
    val vars = (0 until 4).map { c =>
      val xs = proj.map(_(c))
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    // variance along component c equals eigenvalue c (training used
    // the full corpus here, so no sampling slack)
    vars.zip(m.eigenvalues).foreach { case (v, ev) =>
      assert(math.abs(v - ev) < 1e-6 * math.max(1.0, ev), s"var $v vs ev $ev")
    }
    assert(vars.zip(vars.tail).forall { case (a, b) => a >= b - 1e-9 })
  }

  test("planted dominant direction is recovered as the first component") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    // x = t·e0 (t ~ ±10, dominant) + small noise in other dims
    val data = (0L until 300L).map { i =>
      val t = if (i % 2 == 0) 10.0f else -10.0f
      val v = Array.tabulate(8)(d =>
        if (d == 0) t + rnd.nextFloat() * 0.01f
        else rnd.nextFloat() * 0.1f - 0.05f)
      (i, v)
    }.toDF("vec_id", "embedding")
    val m = Pca.train(data, "embedding", "vec_id", k = 2)
    assert(math.abs(m.basis(0)(0)) > 0.999,
      s"first component should be ~e0, got ${m.basis(0).toSeq}")
    assert(m.eigenvalues(0) > 50.0 && m.eigenvalues(1) < 1.0)
  }

  test("codegen and interpreted projection agree bit-for-bit") {
    val m = Pca.train(emb, "embedding", "vec_id", k = 3)
    def run() = emb.orderBy(col("vec_id")).limit(20)
      .select(Pca.project(col("embedding"), m).as("p"))
      .collect().map(_.getSeq[Double](0).map(java.lang.Double.doubleToLongBits))
    val viaCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run().toSeq == viaCodegen.toSeq)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
