package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Scale evidence: AQE's runtime re-plan splits a skewed join
  * partition — the complement to the salting helper (Skew.saltedAgg
  * covers aggregation skew; AQE covers join skew).
  */
class SkewJoinSpec extends SparkTestBase {

  test("AQE splits the hot key's partition in a skewed sort-merge join") {
    import spark.implicits._
    // hot key 0 carries 200k rows; the rest are tiny
    val left = spark.range(0, 200000).select(lit(0L).as("k"), col("id").as("v"))
      .union(spark.range(1, 2000).select(col("id").as("k"), col("id").as("v")))
    val right = spark.range(0, 2000).select(col("id").as("k"), (col("id") * 10).as("w"))
    val old = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.enabled" -> spark.conf.get("spark.sql.adaptive.enabled"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "128KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try {
      val joined = left.join(right, Seq("k"))
      // run THIS dataframe's own query execution so its adaptive plan
      // finalizes (count() would plan a separate aggregate query)
      val n = joined.collect().length
      assert(n == 200000 + 1999)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew split in plan:\n${plan.take(2000)}")
    } finally {
      old.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }
}
