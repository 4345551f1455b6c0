package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The quantizer training sample must be a pure function of
  * (id, seed): `df.sample`'s per-partition Bernoulli draw changed
  * with partitioning, silently breaking the trainers'
  * bit-reproducibility claim past the maxTrainRows cutoff.
  */
class TrainSampleSpec extends SparkTestBase {

  private def vecs(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, Array.tabulate(4)(j => (i + j).toFloat)))
      .toDF("id", "vec")
  }

  test("sample membership is independent of partitioning") {
    val df = vecs(5000)
    val a = TrainSample.collect(df.repartition(1), "vec", "id", 7L, 1000L)
    val b = TrainSample.collect(df.repartition(16), "vec", "id", 7L, 1000L)
    val c = TrainSample.collect(
      df.repartition(5, col("id") % 5), "vec", "id", 7L, 1000L)
    assert(a.map(_._1).toSeq == b.map(_._1).toSeq)
    assert(a.map(_._1).toSeq == c.map(_._1).toSeq)
    // bounded: close to the target, never wildly above
    assert(a.length <= 1200 && a.length >= 800, s"got ${a.length}")
  }

  test("sub-cutoff corpora are taken whole, sorted by id") {
    val a = TrainSample.collect(vecs(100).repartition(8), "vec", "id", 7L, 1000L)
    assert(a.map(_._1).toSeq == (0L until 100L))
  }

  test("different seeds select different rows") {
    val df = vecs(5000)
    val a = TrainSample.collect(df, "vec", "id", 7L, 1000L).map(_._1).toSet
    val b = TrainSample.collect(df, "vec", "id", 8L, 1000L).map(_._1).toSet
    assert(a != b)
  }
}
