package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Scale evidence: bucketing co-locates a fact-fact join — writing
  * orders and lineitem bucketed by the join key makes the join plan
  * shuffle-free (no Exchange above either scan), the layout an
  * at-scale deployment uses for repeated join keys.
  */
class BucketingSpec extends SparkTestBase {

  test("join of two tables bucketed on the key plans without a shuffle") {
    // default warehouse (./spark-warehouse, gitignored)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.read.parquet(sf() + "/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("b_orders")
    spark.read.parquet(sf() + "/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("b_lineitem")
    // disable broadcast so a shuffle would otherwise be required
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.executedPlan.toString
      val joinLine = plan.linesIterator.find(_.contains("SortMergeJoin")).getOrElse("")
      assert(joinLine.nonEmpty, s"expected a sort-merge join:\n$plan")
      // no shuffle between the scans and the join: the only Exchange
      // allowed is the one ABOVE the join for the final aggregation
      val joinIdx = plan.indexOf("SortMergeJoin")
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // and it computes the right thing
      val direct = spark.read.parquet(sf() + "/lineitem.parquet")
        .join(spark.read.parquet(sf() + "/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
      assert(joined.orderBy("o_orderpriority").collect().toSeq ==
        direct.orderBy("o_orderpriority").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
