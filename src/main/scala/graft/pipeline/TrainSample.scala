package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The bounded, DETERMINISTIC training sample shared by the quantizer
  * trainers ([[Pca.train]], [[Pq.train]], [[Ivf]]'s k-means). Two
  * contracts:
  *
  *  - bounded: at most ~maxTrainRows × 1.05 rows ever reach the
  *    driver, whatever the corpus size — the trainers' "bounded
  *    driver fold" scale story;
  *  - content-deterministic: membership is a pure function of
  *    (id, seed) — `splitmix64(id + seed)`'s unit uniform under a
  *    fixed threshold — NEVER `df.sample`, whose per-partition
  *    Bernoulli draw changes with partitioning. The trained
  *    basis/codebooks/centroids are therefore bit-reproducible
  *    across runs, partitionings, and engines even past the cutoff
  *    (the same ids are selected no matter how the data is laid
  *    out), which is what the trainers' determinism claims and their
  *    Python oracles rely on.
  */
object TrainSample {
  /** Collect `(id, vector)` rows sorted by id, thinned to ~maxTrainRows
    * via the deterministic per-id filter when the corpus is larger.
    */
  def collect(df: DataFrame, vecCol: String, idCol: String, seed: Long,
              maxTrainRows: Long): Array[(Long, Array[Float])] = {
    val spark = df.sparkSession
    import spark.implicits._
    val total = df.count()
    val trainDf =
      if (total <= maxTrainRows) df
      else {
        val p = math.min(1.0, maxTrainRows.toDouble * 1.05 / total)
        df.where(graft.functions.HashFunctions
          .unitUniform(col(idCol).cast("long"), seed) < lit(p))
      }
    val sample = trainDf.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    require(sample.nonEmpty, "cannot train on an empty corpus")
    sample
  }
}
