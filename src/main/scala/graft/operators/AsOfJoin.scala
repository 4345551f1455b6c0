package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `rightTs <= leftTs` within the same key (the time-series join the
  * reference lacks — SURVEY.md §2.3 "absent" list; a first-class
  * operator in a training-data pipeline for aligning events to the
  * most recent state snapshot).
  *
  * Spark-first composition (preference (a) over a custom planner
  * node): tag both sides, union, and take a running `last_value(...,
  * ignoreNulls)` of the right payload over (key, ts) order — a single
  * shuffle on the key, O(n log n) in the partition sort, no
  * range-explosion join. At equal timestamps the right row sorts
  * first, so `<=` semantics hold (DuckDB `ASOF JOIN ... ON l.ts >=
  * r.ts` agrees).
  */
object AsOfJoin {

  /** @param rightCols right-side payload columns to attach (nulls when
    *                  no right row is at-or-before the left row)
    * @param tiebreakCol right-side column that disambiguates right rows
    *                  sharing (key, ts) — a scalar compare per row. When
    *                  None, the whole payload struct is the tiebreaker
    *                  (same determinism, struct-compare cost).
    */
  def asOfLeft(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               rightCols: Seq[String],
               tiebreakCol: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_ts", col(leftTsCol))
      .withColumn("_side", lit(1))
      .withColumn("_payload",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          rightCols.map(c => org.apache.spark.sql.types.StructField(c,
            right.schema(c).dataType)))))
      .withColumn("_key", col(keyCol))
    val r = right
      .select(Seq(col(rightTsCol).as("_ts"), lit(0).as("_side"),
        struct(rightCols.map(col): _*).as("_payload"),
        col(keyCol).as("_key")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val unioned = l.select(
      (leftCols.map(col) ++ Seq(col("_ts"), col("_side"), col("_payload"), col("_key"))): _*)
      .unionByName(r)
    // A final sort key makes the pick among right rows sharing
    // (key, ts) deterministic across runs/partitionings — without it,
    // last(..., ignoreNulls) would return whichever duplicate the
    // shuffle happened to order last. A caller-named scalar id column
    // compares per-row in O(1); the payload-struct fallback is the
    // same determinism at struct-compare cost. Left rows (_side=1)
    // carry null in either key — harmless, _side already orders them
    // after the right rows they must see.
    val tiebreak = tiebreakCol
      .map(c => col("_payload").getField(c)).getOrElse(col("_payload"))
    val w = Window.partitionBy(col("_key"))
      .orderBy(col("_ts"), col("_side"), tiebreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = unioned
      .withColumn("_asof", last(col("_payload"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
    rightCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, col("_asof").getField(c))
    }.drop("_ts", "_side", "_payload", "_key", "_asof")
  }
}
