package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Exact order-statistics contracts: the rank-selection rule replays
  * a driver mirror, results are partition-invariant, duplicate pcts
  * mapping to one rank still emit one row each, and the plan never
  * runs a global one-reducer window.
  */
class OrderStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def data = Seq(
    (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 20L), (4L, "a", 50L),
    (5L, "a", 40L), (6L, "b", 7L), (7L, "b", 3L), (8L, "c", 99L))
    .toDF("id", "grp", "v")

  private def mirror(rows: Seq[(Long, String, Long)], pcts: Seq[Int]) =
    rows.groupBy(_._2).toSeq.flatMap { case (g, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._1))
      val n = sorted.size.toLong
      pcts.map { p => (g, p, sorted((p.toLong * (n - 1) / 100L).toInt)._3) }
    }.sortBy(t => (t._1, t._2))

  test("matches the driver mirror across group sizes 1/2/5") {
    val pcts = Seq(0, 25, 50, 75, 100)
    val got = OrderStats.exactPercentiles(spark, data, "grp", "v", "id", pcts)
      .orderBy("grp", "pct").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    val want = mirror(
      data.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq,
      pcts)
    assert(got == want)
    // tiny group: every pct collapses to the single element, one row per pct
    assert(got.filter(_._1 == "c") == Seq(("c", 0, 99L), ("c", 25, 99L),
      ("c", 50, 99L), ("c", 75, 99L), ("c", 100, 99L)))
  }

  test("partition-invariant; ties break by id") {
    val tied = Seq((10L, "a", 5L), (11L, "a", 5L), (12L, "a", 5L),
      (13L, "a", 9L)).toDF("id", "grp", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      OrderStats.exactPercentiles(spark, df, "grp", "v", "id", Seq(50))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(run(tied) == Seq(("a", 50, 5L)))
    assert(run(data) == run(data.repartition(7)))
    assert(run(data) == run(data.coalesce(1)))
  }

  test("plan: per-partition window only, broadcast rank join") {
    val pdocs = spark.read.parquet(s"${sf()}/documents.parquet")
    val plan = OrderStats.exactPercentiles(spark, pdocs, "lang", "n_chars",
      "doc_id", Seq(0, 50, 100)).queryExecution.executedPlan.toString
    // the window partitions by (pid, grp) — never a single global
    // partition — and the target-rank join is broadcast
    assert(plan.contains("pid"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
