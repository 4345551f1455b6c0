package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the version-over-version audit every
  * periodically-recrawled corpus runs: which documents were added,
  * removed, or changed between snapshot v1 and v2, by CONTENT (the
  * whitespace/case-normalized fingerprint), not by mtime or blind
  * byte compare.
  *
  * 100 TB shape: each side reduces to (id, fingerprint) map-side
  * (the md5 is computed during the scan, so full text never crosses
  * the wire), then ONE id-keyed full-outer join — a single shuffle of
  * two slim 2-column frames. Presence is tracked with explicit flags
  * rather than fingerprint NULL-ness, so a present row with NULL text
  * still classifies correctly (its NULL fingerprint null-safe-equals
  * the other side's).
  */
object Snapshot {

  /** (id, status) for every id in either snapshot: `added` (new side
    * only), `removed` (old side only), `changed` (both, fingerprints
    * differ), `unchanged` (both, fingerprints null-safe-equal).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           idCol: String, textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp_old"),
      lit(true).as("in_old"))
    val n = newDf.select(col(idCol).as("id"),
      TextAnalysis.fingerprint(col(textCol)).as("fp_new"),
      lit(true).as("in_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("in_old").isNull, "added")
          .when(col("in_new").isNull, "removed")
          .when(col("fp_old") <=> col("fp_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Bounded rollup of [[diff]]: one row per status. */
  def summary(oldDf: DataFrame, newDf: DataFrame,
              idCol: String, textCol: String): DataFrame =
    diff(oldDf, newDf, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n"))
}
