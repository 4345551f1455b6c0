package graft.streaming

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** The drift monitors' shared state and metric
  * ([[StreamingDrift]], [[StreamingQuarantine]]): ONE definition of
  * the engine-exact TV fold (so the two operators and the DuckDB
  * oracle can never disagree), and the cross-run baseline persisted
  * as `_baseline` inside the monitor's output dir (hidden from
  * readers, the `_model` convention) — a SECOND ingest run compares
  * against everything earlier runs observed instead of starting
  * blind. The baseline is written at successful run close: a crashed
  * run leaves the previous baseline intact, and its replacement run
  * re-observes from there.
  */
private[streaming] object DriftState {

  /** Total-variation distance between the batch profile and the
    * accumulated baseline — ½ Σ_v |c_b(v)/n_b − c_p(v)/n_p| in a
    * value-sorted SEQUENTIAL fold of IEEE doubles (only +,−,×,÷,|·|,
    * so the oracle replays it bit-for-bit; see StreamingDrift's
    * class doc for why not KL). 0.0 when either side is empty.
    */
  def tv(counts: Map[String, Long],
         acc: scala.collection.Map[String, Long]): Double = {
    val nb = counts.values.sum
    val np = acc.values.sum
    if (nb == 0L || np == 0L) 0.0
    else 0.5 * (counts.keySet ++ acc.keySet).toSeq.sorted
      .foldLeft(0.0) { (sum, v) =>
        sum + math.abs(
          counts.getOrElse(v, 0L).toDouble / nb -
          acc.getOrElse(v, 0L).toDouble / np)
      }
  }

  private def baselinePath(outPath: String) = s"$outPath/_baseline"

  /** Load the persisted cross-run baseline (empty if none yet). */
  def load(spark: SparkSession,
           outPath: String): scala.collection.mutable.Map[String, Long] = {
    val p = new org.apache.hadoop.fs.Path(baselinePath(outPath))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val acc = scala.collection.mutable.Map.empty[String, Long]
    if (fs.exists(p))
      spark.read.parquet(p.toString).collect()
        .foreach(r => acc.update(r.getString(0), r.getLong(1)))
    acc
  }

  /** Persist the baseline at run close (tiny: one row per value of a
    * low-cardinality categorical).
    */
  def save(spark: SparkSession, outPath: String,
           acc: scala.collection.Map[String, Long]): Unit = {
    import spark.implicits._
    acc.toSeq.sortBy(_._1).toDF("dim", "c")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(baselinePath(outPath))
  }
}
