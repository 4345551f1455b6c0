package graft.core

import org.apache.spark.sql.DataFrame

/** Storage hygiene for `localCheckpoint(true)`-pinned frames.
  *
  * `Dataset.unpersist` only clears CacheManager entries; the block
  * storage behind a local checkpoint lives until session end unless the
  * underlying RDD is unpersisted explicitly. Iterative operators that
  * re-pin every round (label propagation, append-log compaction) must
  * release superseded rounds or they accumulate dozens of dead block
  * sets — measured as a multi-second tax on unrelated queries sharing
  * the JVM (BENCH_r02: dedup_exact at 21 s purely from the preceding
  * query's leaked blocks).
  */
object Pinned {

  /** Unpersist every checkpointed RDD leaf in `df`'s plan. Safe once a
    * successor frame has been eagerly checkpointed (the successor's
    * blocks are independent of its parents').
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(false))
}
