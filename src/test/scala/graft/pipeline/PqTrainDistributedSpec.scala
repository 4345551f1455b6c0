package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Pq.trainDistributed]] — the full-corpus per-subspace Lloyd's
  * whose fixed-point sums make the distributed fold order-independent
  * (the [[Ivf.trainDistributed]] design on positional L2 codebooks).
  * The hand-replay case independently re-derives the documented
  * variant (shared splitmix init, half-up fixed-point sums, plain-L2
  * mean updates) on a tiny corpus.
  */
class PqTrainDistributedSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def bookBits(m: Pq.PqModel): Seq[Seq[Seq[Int]]] =
    m.codebooks.toSeq.map(_.toSeq.map(
      _.toSeq.map(java.lang.Float.floatToIntBits)))

  test("distributed PQ is bit-identical across partitionings") {
    val a = Pq.trainDistributed(emb.repartition(1), "embedding", "vec_id",
      m = 4, ksub = 8, iters = 2)
    val b = Pq.trainDistributed(emb.repartition(7), "embedding", "vec_id",
      m = 4, ksub = 8, iters = 2)
    assert(bookBits(a) == bookBits(b))
  }

  test("one iteration replays the documented fold (incl. empty-cluster keep)") {
    import spark.implicits._
    // dim 4, m 2, dsub 2; rows 0 and 1 identical so one of their init
    // centroids goes empty in at least one subspace
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.5f, 0.5f)),
      (1L, Array(1.0f, 0.0f, 0.5f, 0.5f)),
      (2L, Array(0.0f, 1.0f, -0.5f, 0.25f)),
      (3L, Array(0.5f, 0.5f, 0.0f, -1.0f)))
    val got = Pq.trainDistributed(rows.toDF("vec_id", "embedding"),
      "embedding", "vec_id", m = 2, ksub = 3, iters = 1)

    def mix(x0: Long): Long = {
      var z = x0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val seed = 42L
    val (m, dsub, ksub) = (2, 2, 3)
    val init = rows.map { case (id, v) => (mix(id + seed), id, v) }
      .sortBy { case (h, id, _) => (h, id) }.take(ksub).map(_._3)
    var books = Array.tabulate(m)(j => init.map(v =>
      java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub)).toArray)
    val F = Pq.TrainFixedPointScale
    def fix(x: Double): Long =
      java.math.BigDecimal.valueOf(x * F)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val sums = Array.fill(m, ksub)(new Array[Long](dsub))
    val counts = Array.fill(m)(new Array[Long](ksub))
    rows.foreach { case (_, v) =>
      for (j <- 0 until m) {
        val sub = (0 until dsub).map(i => v(j * dsub + i).toDouble)
        val best = books(j).zipWithIndex.map { case (cent, c) =>
          (sub.zip(cent).map { case (x, y) =>
            val d = x - y.toDouble; d * d }.sum, c)
        }.min._2
        for (i <- 0 until dsub) sums(j)(best)(i) += fix(sub(i))
        counts(j)(best) += 1
      }
    }
    books = Array.tabulate(m)(j => books(j).zipWithIndex.map {
      case (old, c) =>
        if (counts(j)(c) == 0) old
        else sums(j)(c).map(s => ((s.toDouble / F) / counts(j)(c)).toFloat)
    })
    assert(counts.exists(_.contains(0L)),
      "fixture must exercise the empty-cluster keep")
    assert(bookBits(got) == books.toSeq.map(_.toSeq.map(
      _.toSeq.map(java.lang.Float.floatToIntBits))))
  }

  test("ADC recall parity with the driver-fold codebooks") {
    // quantization loss caps PQ recall on this tiny corpus; the claim
    // is PARITY — full-corpus training must serve at least as well as
    // (within noise of) the bounded-sample fold, which here sees the
    // same 500 rows
    def recallOf(model: Pq.PqModel): Double = {
      val qs = emb.where(col("vec_id") < 10)
      Similarity.recallAtK(
          Similarity.bruteForceTopK(emb, qs, "embedding", "vec_id", k = 5),
          Pq.pqTopK(emb, qs, "embedding", "vec_id", k = 5, model,
            oversample = 4),
          k = 5)
        .agg(avg(col("recall"))).head().getDouble(0)
    }
    val dist = recallOf(Pq.trainDistributed(emb, "embedding", "vec_id",
      m = 8, ksub = 16, iters = 3))
    val drv = recallOf(Pq.train(emb, "embedding", "vec_id",
      m = 8, ksub = 16, iters = 3))
    assert(dist >= drv - 0.1,
      s"distributed ADC recall $dist vs driver-fold $drv")
    assert(dist > 0.2, s"distributed ADC recall $dist")
  }

  test("null and empty vectors train nothing — init and fold alike") {
    import spark.implicits._
    val clean = emb.limit(40).localCheckpoint(true)
    val mx = clean.agg(max(col("vec_id"))).head().getLong(0)
    val dirty = clean.unionByName(Seq(
        (mx + 1, null.asInstanceOf[Array[Float]]),
        (mx + 2, Array.empty[Float]))
      .toDF("vec_id", "embedding"))
    val a = Pq.trainDistributed(clean, "embedding", "vec_id",
      m = 8, ksub = 4, iters = 2)
    val b = Pq.trainDistributed(dirty, "embedding", "vec_id",
      m = 8, ksub = 4, iters = 2)
    assert(bookBits(a) == bookBits(b))
  }

  test("refusals: empty corpus, indivisible dim, oversized ksub") {
    import spark.implicits._
    val e = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Pq.trainDistributed(e, "embedding", "vec_id")
    }
    intercept[IllegalArgumentException] {
      Pq.trainDistributed(emb, "embedding", "vec_id", m = 7)
    }
    intercept[IllegalArgumentException] {
      Pq.trainDistributed(emb, "embedding", "vec_id", ksub = 300)
    }
  }
}
