package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class OperatorsSpec extends SparkTestBase {

  test("asOfLeft: latest right at-or-before, per key; null when none") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 20L), (1L, 5L), (2L, 10L))
      .toDF("k", "ts").withColumn("lid", monotonically_increasing_id())
    val right = Seq((1L, 8L, "a"), (1L, 10L, "b"), (1L, 15L, "c"), (3L, 1L, "z"))
      .toDF("k", "rts", "tag")
    val out = AsOfJoin.asOfLeft(left, right, "k", "ts", "rts", Seq("tag", "rts"))
      .select("k", "ts", "tag").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(out == Set(
      (1L, 10L, Some("b")), // ties: right at 10 counts (<=)
      (1L, 20L, Some("c")),
      (1L, 5L, None), // nothing at-or-before
      (2L, 10L, None))) // key with no right rows
  }

  test("saltedAgg equals direct groupBy for decomposable aggregates") {
    val df = graft.queries.Queries.tbl(spark, sf(), "events")
      .select(col("event_type"), col("value"), col("user_id"))
    val salted = Skew.saltedAgg(df, Seq("event_type"), buckets = 16,
      aggs = Seq(Skew.AggSpec("value", "sum", "sv"),
        Skew.AggSpec("value", "count", "n"),
        Skew.AggSpec("user_id", "min", "mn"),
        Skew.AggSpec("user_id", "max", "mx")))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 1e6), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val direct = df.groupBy("event_type")
      .agg(sum("value").as("sv"), count(lit(1)).as("n"),
        min("user_id").as("mn"), max("user_id").as("mx"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), math.round(r.getDouble(1) * 1e6), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(salted.toSeq == direct.toSeq)
    intercept[IllegalArgumentException](
      Skew.saltedAgg(df, Seq("event_type"), 4,
        Seq(Skew.AggSpec("value", "avg", "a"))).collect())
  }

  test("saltedJoin row multiset equals the plain inner join") {
    import spark.implicits._
    // a heavily skewed probe side: key 1 holds most rows
    val probe = ((1 to 200).map(i => (1L, i.toLong)) ++
      (1 to 20).map(i => (2L, 1000L + i)) :+ (3L, 9999L))
      .toDF("k", "v")
    val build = Seq((1L, "hot"), (2L, "warm"), (4L, "unmatched"))
      .toDF("k", "tag")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "tag").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sorted.toSeq
    val salted = canon(Skew.saltedJoin(probe, build, "k", buckets = 8))
    val plain = canon(probe.join(build, Seq("k")))
    assert(salted == plain)
    assert(salted.size == 220) // hot 200 + warm 20, key 3/4 unmatched
  }

  test("AQE splits a skewed join partition at runtime (skew=true in plan)") {
    // the OTHER half of the skew story next to explicit salting: AQE's
    // OptimizeSkewedJoin re-plans a sort-merge join whose largest
    // partition dwarfs the advisory size. Thresholds lowered so the
    // ~190k-row hot key trips it at test scale.
    import spark.implicits._
    val restore = Seq(
      "spark.sql.adaptive.enabled", "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = spark.range(200000L)
        .select((col("id") % 20 === 0).cast("long").as("k"), col("id").as("v"))
      val build = Seq((0L, "cold"), (1L, "hot")).toDF("k", "name")
      val joined = probe.join(build, Seq("k"))
      // collect() drives THIS DataFrame's own QueryExecution (count()
      // would plan a different query), so executedPlan is the final
      // adaptive plan afterwards
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE should have split the skewed partition:\n${plan.take(2000)}")
    } finally restore.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}
