package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** The bounded, DETERMINISTIC training sample shared by the quantizer
  * trainers ([[Pca.train]], [[Pq.train]], [[Ivf]]'s k-means). Two
  * contracts:
  *
  *  - bounded: at most ~maxTrainRows × 1.05 rows ever reach the
  *    driver, whatever the corpus size — the trainers' "bounded
  *    driver fold" scale story;
  *  - content-deterministic: membership is a pure function of
  *    (id, seed, corpus size) — `splitmix64(id + seed)`'s unit
  *    uniform under a fixed threshold — NEVER `df.sample`, whose
  *    per-partition Bernoulli draw changes with partitioning. The
  *    trained basis/codebooks/centroids are therefore
  *    bit-reproducible across runs, partitionings, and engines even
  *    past the cutoff (the same ids are selected no matter how the
  *    data is laid out), which is what the trainers' determinism
  *    claims and their Python oracles rely on.
  *
  * Since r8 the count and the sample come from ONE pass (r7 ran a
  * full `count()` job before the filtered collect): a treeAggregate
  * computes the exact row count while a bounded per-partition heap
  * keeps the K rows with the smallest uniforms, K sized so that the
  * set {u < p} for the threshold p implied by the count is inside the
  * heap except with negligible probability (a binomial tail ~6σ past
  * its mean; the condition is VERIFIED driver-side — the Kth-smallest
  * uniform bounds what the heap can have missed — and the rare miss
  * falls back to the old exact two-pass path, so selection is
  * bit-identical to r7 in every case).
  */
object TrainSample {
  /** Collect `(id, vector)` rows sorted by id, thinned to ~maxTrainRows
    * via the deterministic per-id filter when the corpus is larger.
    * Throws on an empty corpus — callers that tolerate emptiness use
    * [[collectWithTotal]].
    */
  def collect(df: DataFrame, vecCol: String, idCol: String, seed: Long,
              maxTrainRows: Long): Array[(Long, Array[Float])] = {
    val sample = collectWithTotal(df, vecCol, idCol, seed, maxTrainRows)._1
    require(sample.nonEmpty, "cannot train on an empty corpus")
    sample
  }

  /** [[collect]] without the non-empty requirement, also returning the
    * exact corpus row count — both from a single Spark job.
    */
  def collectWithTotal(df: DataFrame, vecCol: String, idCol: String,
                       seed: Long, maxTrainRows: Long)
      : (Array[(Long, Array[Float])], Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val target = maxTrainRows.toDouble * 1.05
    // heap bound: mean of the binomial #{u < p} plus a ~6σ tail plus
    // slack — large enough that a miss is astronomically rare, small
    // enough that the driver fold stays bounded at maxTrainRows scale
    val k = math.ceil(target + 6.0 * math.sqrt(target) + 16.0).toLong
      .min(Int.MaxValue.toLong - 8L).toInt
    // the uniform rides the row, computed by the SAME Catalyst
    // expression the r7 filter used — the driver-side `u < p`
    // comparison below is then bit-identical to the old pushed filter
    val rdd = df.select(col(idCol).cast("long"),
        col(vecCol),
        graft.functions.HashFunctions.unitUniform(col(idCol).cast("long"), seed))
      .as[(Long, Array[Float], Double)].rdd
    // max-heap on (u, id): evicting the head drops the largest
    // uniform, leaving the k smallest — ids are unique so the order
    // is total and partition-independent
    implicit val ord: Ordering[(Long, Array[Float], Double)] =
      Ordering.by(t => (t._3, t._1))
    type Acc = (Long, mutable.PriorityQueue[(Long, Array[Float], Double)])
    def trim(h: mutable.PriorityQueue[(Long, Array[Float], Double)]): Unit =
      while (h.size > k) h.dequeue()
    val (total, heap) = rdd.treeAggregate[Acc](
      (0L, mutable.PriorityQueue.empty[(Long, Array[Float], Double)]))(
      seqOp = { case ((n, h), row) => h += row; trim(h); (n + 1L, h) },
      combOp = { case ((n1, h1), (n2, h2)) =>
        val (big, small) = if (h1.size >= h2.size) (h1, h2) else (h2, h1)
        big ++= small; trim(big); (n1 + n2, big)
      })
    val rows = heap.toArray
    if (total <= maxTrainRows) {
      // no thinning: total ≤ maxTrainRows < k, so the heap holds the
      // whole corpus
      (rows.map(t => (t._1, t._2)).sortBy(_._1), total)
    } else {
      val p = math.min(1.0, maxTrainRows.toDouble * 1.05 / total)
      // complete iff the heap never filled (we hold every row) or its
      // largest uniform is ≥ p (nothing below p was evicted)
      val complete = rows.length < k || rows.iterator.map(_._3).max >= p
      if (complete)
        (rows.filter(_._3 < p).map(t => (t._1, t._2)).sortBy(_._1), total)
      else {
        // negligible-probability path, kept for bit-exactness: the
        // r7 two-pass filtered collect
        val sample = df.where(graft.functions.HashFunctions
            .unitUniform(col(idCol).cast("long"), seed) < lit(p))
          .select(col(idCol).cast("long"), col(vecCol))
          .as[(Long, Array[Float])].collect().sortBy(_._1)
        (sample, total)
      }
    }
  }
}
