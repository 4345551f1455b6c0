package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Corpus-selection operators above the per-document signals: the
  * step that turns scores into an actual training set.
  */
object Curation {

  /** Budgeted greedy selection — "take the best documents until the
    * token budget is spent": documents ranked by (score desc, id asc),
    * a document is selected iff the cumulative token count through it
    * (inclusive, in rank order) stays ≤ `budget`. The cumulative sum
    * is monotone, so the selection is a true prefix of the ranking —
    * the standard data-selection contract (and exactly a SQL window
    * cumsum, which is what the oracle replays).
    *
    * The 100 TB shape: a global `Window.orderBy` would collapse the
    * corpus into ONE partition, so the running total is computed the
    * distributed way (the [[SeqPack]] pattern): range-repartition by
    * the rank key, per-partition window cumsum, plus a driver-side
    * prefix of the P per-partition totals broadcast back. The
    * partitioned frame is checkpointed once so both passes see the
    * same partition ids.
    *
    * Output: (doc, score, n_tokens, cum_tokens, selected) — all rows,
    * flagged, so callers filter `selected` or audit the boundary.
    */
  def selectByBudget(spark: SparkSession, df: DataFrame, scoreCol: String,
                     idCol: String, textCol: String, budget: Long,
                     numParts: Int = 0): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val parts =
      if (numParts > 0) numParts else spark.sessionState.conf.numShufflePartitions
    val base = df
      .select(col(idCol).as("doc"), col(scoreCol).cast(DoubleType).as("score"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .repartitionByRange(parts, col("score").desc, col("doc"))
      .sortWithinPartitions(col("score").desc, col("doc"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    val totals = base.groupBy(col("pid")).agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts).scanLeft(0L) {
      (acc, p) => acc + totals.getOrElse(p, 0L)
    }
    import spark.implicits._
    val offDf = (0 until parts).map(p => (p, offsets(p))).toDF("pid", "off")
    val w = Window.partitionBy(col("pid"))
      .orderBy(col("score").desc, col("doc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offDf), Seq("pid"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w) + col("off"))
      .select(col("doc"), col("score"), col("n_tokens"), col("cum_tokens"),
        (col("cum_tokens") <= budget).as("selected"))
  }

  /** Cluster-balanced sampling — flatten the topic distribution: rows
    * are k-means-assigned to their nearest centroid (the engine's
    * deterministic IVF quantizer) and AT MOST `quota` rows survive per
    * cluster, chosen by the engine's deterministic per-row uniform
    * (splitmix64 of (id + seed)) with id tie-break. Over-represented
    * topics are cut to the quota, rare topics are kept whole — the
    * standard re-balancing step after clustering a web-scale corpus
    * (cf. the cluster-dedup + balance stage of SemDeDup-style
    * pipelines and DataComp's cluster-based filtering).
    *
    * The 100 TB shape: assignment is a map-side codegen pass
    * ([[Ivf.assign]]); the per-cluster cut uses the bounded-heap
    * [[graft.functions.TopKByScore]] aggregate — O(quota) state per
    * cluster, partial heaps combined map-side, only quota rows per
    * cluster cross the shuffle. A `Window.partitionBy(cluster)` +
    * row_number plan would shuffle and sort EVERY row; this never
    * materializes more than the survivors. Selection is a pure
    * function of (id, seed, model) — partition- and run-invariant.
    *
    * Output: (cluster, vec_id, u) — survivors only, `u` the uniform
    * that ranked them (exact dyadic, oracle-replayable).
    */
  def clusterBalancedSample(df: DataFrame, vecCol: String, idCol: String,
                            model: IvfModel, quota: Int,
                            seed: Long = 42L): DataFrame = {
    require(quota > 0, "quota must be positive")
    val u = graft.functions.HashFunctions.unitUniform(col(idCol), seed)
    Ivf.assign(df, vecCol, model)
      .select(col("cluster"), col(idCol).as("vec_id"), u.as("u"))
      // heap keeps the k HIGHEST scores — negate so the k smallest
      // uniforms survive (ties to lower id, matching the mirror's
      // (u, id) sort)
      .groupBy(col("cluster"))
      .agg(graft.functions.TopKByScore.topKBy(-col("u"), col("vec_id"),
        quota).as("tk"))
      .select(col("cluster"), explode(col("tk")).as("s"))
      .select(col("cluster"), col("s.id").as("vec_id"),
        (-col("s.score")).as("u"))
  }
}
