package graft.pipeline

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exact per-group order statistics (percentiles by rank selection).
  *
  * `percentile_approx` trades exactness for a sketch; this operator
  * keeps the answer EXACT with a deterministic integer rule: for a
  * group of n rows ordered by (value, id), percentile p selects the
  * element at 0-based rank floor(p·(n−1)/100) — the "lower" rule, a
  * pure integer function, so any engine replays it bit-for-bit (no
  * interpolation, no float quantile semantics to match).
  *
  * 100 TB shape — the distributed-rank pattern [[Split]] and
  * [[SeqPack]] use: range-partition by (group, value, id), ONE
  * per-partition window for local ranks, a driver prefix of
  * O(P + #groups) partition counts for global offsets, and a
  * broadcast join against the tiny (group, pct, target-rank) table.
  * Never a one-reducer global window; a giant group still spans
  * partitions.
  */
object OrderStats {

  /** (group, pct, v): the exact pct-th percentile (lower rule) of
    * `valueCol` within each `groupCol` group. `pcts` are integer
    * percents in [0, 100].
    */
  def exactPercentiles(spark: SparkSession, df: DataFrame,
                       groupCol: String, valueCol: String, idCol: String,
                       pcts: Seq[Int], numParts: Int = 0): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 0 && p <= 100),
      "pcts must be integer percents in [0, 100]")
    val parts =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val base = df
      .select(col(groupCol).cast(StringType).as("grp"),
        col(valueCol).cast(LongType).as("v"), col(idCol).as("id"))
      .repartitionByRange(parts, col("grp"), col("v"), col("id"))
      .sortWithinPartitions("grp", "v", "id")
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true) // counts + rank join reuse it
    // O(P + #groups) rows: each group is contiguous in range order
    val cnt = base.groupBy(col("pid"), col("grp")).count()
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val groups = cnt.keys.map(_._2).toSeq.distinct.sorted
    val pids = cnt.keys.map(_._1).toSeq.distinct.sorted
    val offRows = for {
      g <- groups; p <- pids
      if cnt.contains((p, g))
    } yield (p, g, pids.filter(_ < p).map(q => cnt.getOrElse((q, g), 0L)).sum)
    // target 0-based rank per (group, pct): floor(pct·(n−1)/100) —
    // pure integer arithmetic
    val targetRows = for {
      g <- groups
      n = pids.map(p => cnt.getOrElse((p, g), 0L)).sum
      pct <- pcts
    } yield (g, pct, pct.toLong * (n - 1L) / 100L)
    import spark.implicits._
    val offDf = offRows.toDF("pid", "grp", "off")
    val targetDf = targetRows.toDF("grp", "pct", "rank0")
    val w = Window.partitionBy(col("pid"), col("grp"))
      .orderBy(col("v"), col("id"))
    base.join(broadcast(offDf), Seq("pid", "grp"))
      .withColumn("rank0",
        row_number().over(w).cast(LongType) - 1L + col("off"))
      .join(broadcast(targetDf), Seq("grp", "rank0"))
      .select(col("grp"), col("pct"), col("v"))
  }
}
