package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Weighted-sampling (A-ES exponential race) contracts: the race key
  * is deterministic, weight-monotone, and inclusion frequency tracks
  * weight in the k=1 case; the DataFrame cut equals a driver replay
  * of the kernel; results are partition-invariant; the stratified
  * variant wins per stratum.
  */
class SampleSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b c", "en"), (2L, "d e", "en"), (3L, "f g h i", "en"),
    (4L, "j", "de"), (5L, "k l m", "de"), (6L, "n o p q r", "de"),
    (7L, "s t", "fr"), (8L, "u v w x", "fr"))
    .toDF("doc_id", "text", "lang")
    .withColumn("w", graft.pipeline.TextAnalysis.tokenCount(col("text")))

  test("kernel: deterministic, weight-monotone, seed-sensitive") {
    assert(Sample.keyKernel(7L, 3L, 42L) == Sample.keyKernel(7L, 3L, 42L))
    // same arrival draw, larger weight => smaller (earlier) key
    val byW = (1L to 50L).map(w => Sample.keyKernel(7L, w, 42L))
    assert(byW == byW.sorted.reverse)
    // seeds decorrelate the draw
    assert((0L until 20L).map(s => Sample.keyKernel(7L, 3L, s)).distinct.size > 15)
  }

  test("k=1 inclusion frequency tracks weight (P ∝ w)") {
    // two items, weights 1 and 3: item 2 must win ~75% of seeds
    val wins = (0L until 2000L).count { s =>
      val k1 = Sample.keyKernel(1L, 1L, s)
      val k2 = Sample.keyKernel(2L, 3L, s)
      k2 < k1 || (k2 == k1 && 2L < 1L)
    }
    assert(wins > 1400 && wins < 1600, s"expected ~1500/2000, got $wins")
  }

  test("DataFrame cut equals the driver replay; partition-invariant") {
    val seed = 99L
    val local = docs.select("doc_id", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .map { case (id, w) => (id, w, Sample.keyKernel(id, w, seed)) }
      .sortBy { case (id, _, k) => (k, id) }.take(3)
      .zipWithIndex.map { case ((id, w, k), i) => (id, w, k, i + 1) }.toSeq
    def got(df: org.apache.spark.sql.DataFrame) =
      Sample.weightedSample(df, "doc_id", "w", k = 3, seed = seed)
        .orderBy("rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got(docs) == local)
    assert(got(docs.repartition(7)) == local)
    assert(got(docs.coalesce(1)) == local)
  }

  test("stratified: k winners inside each stratum, same kernel") {
    val seed = 7L
    val out = Sample.weightedSampleStratified(
        docs, "doc_id", "lang", "w", k = 2, seed = seed)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    val byStratum = out.groupBy(_._1)
    assert(byStratum.keySet == Set("en", "de", "fr"))
    val local = docs.select("doc_id", "w", "lang").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    for ((stratum, rows) <- byStratum) {
      val expect = local.filter(_._3 == stratum)
        .map { case (id, w, _) => (id, Sample.keyKernel(id, w, seed)) }
        .sortBy { case (id, k) => (k, id) }.take(2)
        .zipWithIndex.map { case ((id, k), i) => (stratum, id, k, i + 1) }.toSeq
      assert(rows.sortBy(_._4).toSeq == expect)
    }
  }

  test("plan: race key is codegen map-side; one k-row exchange") {
    // parquet-backed so ConvertToLocalRelation can't pre-evaluate the
    // expression out of the plan
    val pdocs = spark.read.parquet(s"${sf()}/documents.parquet")
      .withColumn("w", graft.pipeline.TextAnalysis.tokenCount(col("text")))
    val plan = Sample.weightedSample(pdocs, "doc_id", "w", 3, 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("race_key"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(!plan.contains("Window"), plan)
    // the weight rides the heap as payload — no winners-back-to-input
    // re-join anywhere in the plan
    assert(!plan.contains("Join"), plan)
  }
}
