package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact top-k frequent terms at corpus scale — the two-pass
  * heavy-hitters design (candidates by a bounded-state sketch, exact
  * counts by a filtered re-aggregation):
  *
  *  1. ONE [[graft.functions.MisraGries]] aggregation over the
  *     exploded terms → ≤ `capacity` candidate terms. The shuffle
  *     carries ≤ capacity counters per partition, NOT the vocabulary
  *     (a direct `groupBy(term).count` ships every distinct n-gram —
  *     billions of keys at 100 TB — to rank 30 of them).
  *  2. One more scan counts JUST the candidates exactly (broadcast
  *     in-set filter, ≤ capacity distinct keys in the agg) — the
  *     emitted counts are exact, the sketch never reaches output.
  *
  * Exactness contract: the true top-k is guaranteed inside the
  * candidate set when the k-th true frequency exceeds
  * N/(capacity+1) (the MG containment bound; N = total term
  * instances) — checkable post-hoc from the emitted exact counts.
  * Size `capacity` ≫ k (default 64×) and the bound holds for any
  * Zipf-ish corpus.
  */
object HeavyHitters {

  /** Exact top-k (term, cnt) by (cnt desc, term asc). */
  def topTerms(spark: SparkSession, df: DataFrame, textCol: String,
               k: Int, capacity: Int = 0): DataFrame = {
    require(k > 0, "k must be positive")
    val cap = if (capacity > 0) capacity else 64 * k
    val terms = df.select(
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val summary = terms
      .agg(graft.functions.MisraGries.misraGries(col("term"), cap).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.term").as("term"))
      .collect().map(_.getString(0))
    // ≤ cap candidate strings — driver-bounded by construction
    terms.where(col("term").isInCollection(summary.toSeq))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term"))
      .limit(k)
  }
}
