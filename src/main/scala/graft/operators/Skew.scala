package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: two-phase groupBy with a salt column.
  *
  * A hot grouping key concentrates its rows in one reduce task; at
  * 100 TB that task is the job. Salting splits each key into
  * `buckets` sub-keys for a partial aggregate, then combines the
  * partials — both phases map-side-combining, the hot key's work
  * spread over `buckets` tasks. Only decomposable aggregates
  * (sum/count/min/max) qualify; AQE's skew-join handling covers the
  * join case, this covers the aggregation case.
  */
object Skew {

  final case class AggSpec(column: String, func: String, as: String)

  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                aggs: Seq[AggSpec]): DataFrame = {
    require(buckets > 0)
    val salted = df.withColumn("_salt", pmod(spark_partition_id()
      + xxhash64(monotonically_increasing_id()), lit(buckets)))
    def phase1(a: AggSpec): Column = (a.func match {
      case "sum" => sum(col(a.column))
      case "count" => count(lit(1))
      case "min" => min(col(a.column))
      case "max" => max(col(a.column))
      case other => throw new IllegalArgumentException(
        s"non-decomposable aggregate $other")
    }).as(a.as)
    def phase2(a: AggSpec): Column = (a.func match {
      case "sum" | "count" => sum(col(a.as))
      case "min" => min(col(a.as))
      case "max" => max(col(a.as))
    }).as(a.as)
    salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(phase1(aggs.head), aggs.tail.map(phase1): _*)
      .groupBy(keys.map(col): _*)
      .agg(phase2(aggs.head), aggs.tail.map(phase2): _*)
  }
}
