package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Snapshot-diff contracts: the four statuses classify exactly on a
  * hand-built pair of versions, whitespace/case drift does NOT count
  * as a change (fingerprint semantics), NULL text on both sides is
  * `unchanged` (presence flags, not fingerprint NULL-ness), and the
  * join shuffles only slim (id, fp) projections — never full text.
  */
class SnapshotSpec extends SparkTestBase {
  import spark.implicits._

  test("statuses classify exactly; whitespace drift is unchanged") {
    val old = Seq(
      (1L, "alpha text"), (2L, "beta text"), (3L, "gamma text"),
      (4L, "Delta   Text"), (9L, "stale doc")).toDF("doc_id", "text")
    val neu = Seq(
      (1L, "alpha text"),          // unchanged
      (2L, "beta text v2"),        // changed
      (4L, "delta text"),          // case+whitespace drift → unchanged
      (5L, "brand new doc")        // added
      ).toDF("doc_id", "text")     // 3L, 9L → removed
    val got = Snapshot.diff(old, neu, "doc_id", "text")
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(got == Seq(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added", 9L -> "removed"))
    val sum = Snapshot.summary(old, neu, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map("unchanged" -> 2L, "changed" -> 1L,
      "removed" -> 2L, "added" -> 1L))
  }

  test("NULL text present on both sides is unchanged, one side is changed") {
    val old = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("doc_id", "text")
    val neu = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = Snapshot.diff(old, neu, "doc_id", "text")
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(got == Seq(1L -> "unchanged", 2L -> "changed"))
  }

  test("only (id, fp) projections cross the join — text is pruned") {
    val old = Seq((1L, "alpha")).toDF("doc_id", "text")
    val neu = Seq((1L, "alpha")).toDF("doc_id", "text")
    val plan = Snapshot.diff(old, neu, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the join keys/output never mention the text column
    val joinLines = plan.split("\n").filter(_.contains("Join"))
    assert(joinLines.nonEmpty && joinLines.forall(!_.contains("text")), plan)
  }
}
