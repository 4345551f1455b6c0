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

  /** Skew-resistant inner equi-join for when the build side is too big
    * to broadcast and a probe key is hot: probe rows scatter uniformly
    * over `buckets` salted sub-keys, build rows replicate `buckets`×
    * (explode), and the join runs on (key, salt) — the hot key's rows
    * land in `buckets` tasks instead of one. Build-side shuffle grows
    * `buckets`×, so size the salt to the skew, not higher. (AQE's
    * skew-join split handles the detectable cases at runtime; this is
    * the explicit tool for when the skew is known up front or AQE's
    * thresholds don't trigger.) Row multiset equals the plain join's —
    * each probe row matches exactly its own salt replica.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    require(buckets > 0)
    val l = probe.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()) + spark_partition_id(),
        lit(buckets)).cast("int"))
    val r = build.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
