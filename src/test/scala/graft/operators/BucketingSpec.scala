package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The whole point of bucketing is the PLAN: a join of two tables
  * bucketed on the join key must read bucket i against bucket i with
  * no Exchange anywhere — this spec pins that, plus result parity
  * with the plain join.
  */
class BucketingSpec extends SparkTestBase {

  private def frames() = {
    import spark.implicits._
    val left = (0L until 1000L).map(i => (i % 100, s"l$i")).toDF("k", "lv")
    val right = (0L until 500L).map(i => (i % 100, i)).toDF("k", "rv")
    (left, right)
  }

  test("bucketed join plan has zero Exchange and bucketed scans") {
    val (l, r) = frames()
    Bucketing.writeBucketed(l, "bkt_spec_l", "k", 4)
    Bucketing.writeBucketed(r, "bkt_spec_r", "k", 4)
    // force the sort-merge path: a broadcast join would hide whether
    // co-location was proven
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "bkt_spec_l", "bkt_spec_r",
        Seq("k"))
      joined.collect() // finalize any adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scans must be bucketed:\n$plan")
      // sortBy at write time: the merge join needs no extra sort of
      // the scan output beyond what the bucket files already provide
      assert(joined.count() ==
        l.join(r, Seq("k")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("mismatched-but-divisible bucket counts still avoid shuffling both sides") {
    val (l, r) = frames()
    Bucketing.writeBucketed(l, "bkt_spec_l8", "k", 8)
    Bucketing.writeBucketed(r, "bkt_spec_r4", "k", 4)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled", "true")
    try {
      val joined = Bucketing.colocatedJoin(spark, "bkt_spec_l8", "bkt_spec_r4",
        Seq("k"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"divisible bucket counts should coalesce, not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("aggregation on the bucket key reuses the layout (no exchange)") {
    val (l, _) = frames()
    Bucketing.writeBucketed(l, "bkt_spec_agg", "k", 4)
    val agg = spark.table("bkt_spec_agg").groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"groupBy on the bucket key must not shuffle:\n$plan")
  }
}
