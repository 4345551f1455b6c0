package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit}

/** The drift monitors' shared state and metric
  * ([[StreamingDrift]], [[StreamingQuarantine]]): ONE definition of
  * the engine-exact TV fold (so the two operators and the DuckDB
  * oracle can never disagree), and the cross-run baseline persisted
  * at the SIBLING path `<outPath>__baseline` — a SECOND ingest run
  * compares against everything earlier runs observed instead of
  * starting blind. The baseline is written at successful run close
  * via a two-rename swap: a crashed run (or a crash mid-save)
  * leaves the previous baseline intact, and its replacement run
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

  /** The category of a null dim value — nulls (undetected language,
    * missing source) count as their own category instead of NPE-ing
    * the fold; String sort keeps the fold order total. Boundary: a
    * GENUINE dim value equal to this string merges with the nulls —
    * acceptable for the contract's label-like categoricals
    * (languages, sources, licenses), where the literal "<null>"
    * does not occur as a real label.
    */
  val NullDim = "<null>"

  /** Hard cap on distinct categories the monitors will fold on the
    * driver. The contract is label-like categoricals (languages,
    * sources, licenses) or pre-bucketed numerics — all far below
    * this; a miswired high-cardinality column (doc text, a raw id)
    * must fail LOUDLY here, not OOM the driver of a 100 TB monitor.
    */
  val MaxCategories = 10000

  /** Per-value counts of the batch's dim column, nulls as
    * [[NullDim]] — the ONE counts derivation both monitors use.
    * Cardinality-capped: collects at most [[MaxCategories]] + 1 rows
    * (the limit is pushed below the collect) and errors loudly past
    * the cap instead of pulling an unbounded histogram to the driver.
    */
  def batchCounts(batch: DataFrame, dimCol: String): Map[String, Long] = {
    val rows = batch.groupBy(coalesce(col(dimCol), lit(NullDim)).as("d"))
      .count().limit(MaxCategories + 1).collect()
    require(rows.length <= MaxCategories,
      s"drift dim '$dimCol' has more than $MaxCategories distinct values " +
        "— the monitors' contract is label-like categoricals or " +
        "pre-bucketed numerics; bucket the column first")
    rows.map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  // SIBLING of the output, not inside it: the monitors' outputs may
  // legitimately never exist (quarantine's kept dir when nothing
  // was kept — missing dir IS the empty result, the family
  // convention), and a baseline write must not conjure them up
  private def baselinePath(outPath: String) = s"${outPath}__baseline"

  /** Load the persisted cross-run baseline (empty if none yet). */
  def load(spark: SparkSession,
           outPath: String): scala.collection.mutable.Map[String, Long] = {
    val p = new org.apache.hadoop.fs.Path(baselinePath(outPath))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a crash between save's park and promote leaves the live copy
    // parked — the shared recovery preamble restores it first
    graft.core.DirSwap.recover(fs, p)
    val acc = scala.collection.mutable.Map.empty[String, Long]
    if (fs.exists(p))
      spark.read.parquet(p.toString).collect()
        .foreach(r => acc.update(r.getString(0), r.getLong(1)))
    acc
  }

  /** Persist the baseline at run close (tiny: one row per value of a
    * low-cardinality categorical) — the shared
    * [[graft.core.DirSwap]] protocol, so a crash mid-save cannot
    * destroy the previous baseline (Spark's Overwrite alone is
    * delete-then-write).
    */
  def save(spark: SparkSession, outPath: String,
           acc: scala.collection.Map[String, Long]): Unit = {
    import spark.implicits._
    val hc = spark.sparkContext.hadoopConfiguration
    val live = new org.apache.hadoop.fs.Path(baselinePath(outPath))
    val fs = live.getFileSystem(hc)
    val tmp = new org.apache.hadoop.fs.Path(baselinePath(outPath) + "__new")
    acc.toSeq.sortBy(_._1).toDF("dim", "c")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    graft.core.DirSwap.recover(fs, live)
    graft.core.DirSwap.promote(fs, live, tmp)
  }
}
