package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Deequ-style data validation (Schelter et al., VLDB'18 "Automating
  * Large-Scale Data Quality Verification"): per-column profiling and
  * declarative constraint checks, the gate a production corpus runs
  * before training ever sees the data.
  *
  * 100 TB shape — the whole point is pass fusion:
  *  - every row-level metric/constraint (null counts, min/max, length
  *    stats, range/accepted/regex compliance) fuses into ONE
  *    single-row aggregation over ONE scan: map-side-combinable
  *    partials, C·k cells per partition crossing the exchange, the
  *    predicates all inside whole-stage codegen. Adding a constraint
  *    adds a column to the agg, not a pass over the corpus.
  *  - exact distinct counts use ONE (name, value) two-level
  *    aggregation (partial agg on the pair, then count per name) —
  *    never `countDistinct(a), countDistinct(b), …` in one agg, whose
  *    Expand multiplies the scanned rows by the column count.
  *  - referential containment is an anti-join count: the dim side of
  *    an FK check is small by definition, so AQE broadcasts it at
  *    runtime (no unconditional hint — a caller-supplied dim frame is
  *    uncapped) and the fact side never shuffles.
  * Output frames are tiny (columns × metrics rows), input frames are
  * never collected.
  */
object Validate {

  private val Sep = "\u0000"

  /** Long-form per-column profile: (col_name, metric, value), value
    * BIGINT so every engine hashes it identically. Metrics by type:
    * every column gets `n_nulls` and exact `n_distinct` (null-
    * exclusive, like SQL COUNT(DISTINCT)); integral columns add
    * `min`/`max`; strings add `len_min`/`len_max`/`len_sum` (in
    * characters). All-NULL or empty input yields NULL min/max (SQL
    * aggregate semantics) and 0 distincts — rows are always present
    * for every (column, metric) pair.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    val fused = profileAdditive(df, cols)
    // exact distincts: one scan exploding each row into (name, value)
    // pairs, partial-aggregated on the pair before the per-name count
    // (coalesce(0) + the spine keeps all-NULL columns present)
    val pairs = df.select(explode(map(cols.flatMap(c =>
      Seq(lit(c), col(c).cast(StringType))): _*)).as(Seq("col_name", "v")))
      .where(col("v").isNotNull)
    val counted = pairs.groupBy("col_name", "v").agg(count(lit(1)))
      .groupBy("col_name").agg(count(lit(1)).as("cnt"))
    val spine = cols.toDF("col_name")
    val nd = spine.join(counted, Seq("col_name"), "left")
      .select(col("col_name"), lit("n_distinct").as("metric"),
        coalesce(col("cnt"), lit(0L)).cast(LongType).as("value"))
    fused.unionByName(nd)
  }

  /** The MERGEABLE subset of [[profile]] — every metric except
    * n_distinct, all combinable across disjoint increments (n_nulls /
    * len_sum by SUM, *_min by MIN, *_max by MAX): the partial a
    * streaming data-card appends per microbatch
    * ([[graft.streaming.StreamingProfile]]'s additive-stats contract,
    * the Bm25 stats-table pattern applied to profiling). One fused
    * single-row aggregation over one scan.
    */
  def profileAdditive(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val fields = cols.map(df.schema(_))
    // (col, metric, aggregate) triples for the fused single-row pass
    val cells: Seq[(String, String, Column)] = fields.flatMap { f =>
      val c = col(f.name)
      // coalesce: COUNT semantics (0 nulls on an empty frame), unlike
      // min/max/len_sum which keep SQL aggregate NULL-on-empty
      val base = Seq((f.name, "n_nulls",
        coalesce(sum(when(c.isNull, 1L).otherwise(0L)), lit(0L))))
      val typed = f.dataType match {
        case ByteType | ShortType | IntegerType | LongType => Seq(
          (f.name, "min", min(c.cast(LongType))),
          (f.name, "max", max(c.cast(LongType))))
        case StringType => Seq(
          (f.name, "len_min", min(length(c).cast(LongType))),
          (f.name, "len_max", max(length(c).cast(LongType))),
          (f.name, "len_sum", sum(length(c).cast(LongType))))
        case _ => Nil
      }
      base ++ typed
    }
    val aggs = cells.map { case (n, m, a) => a.as(n + Sep + m) }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cells.map { case (n, m, _) =>
      struct(lit(n).as("col_name"), lit(m).as("metric"),
        col(s"`$n$Sep$m`").cast(LongType).as("value"))
    }
    row.select(explode(array(entries: _*)).as("e"))
      .select(col("e.col_name"), col("e.metric"), col("e.value"))
  }

  /** A named constraint over one DataFrame. Row-level checks carry
    * the VIOLATION predicate (null-tolerant by construction — a NULL
    * cell never violates a range/accepted/regex check; pair with
    * [[Constraint.notNull]] when NULLs are themselves the defect).
    */
  sealed trait Constraint { def name: String }
  final case class RowCheck(name: String, violated: Column)
    extends Constraint
  final case class Unique(cols: Seq[String]) extends Constraint {
    val name = s"unique(${cols.mkString(",")})"
  }
  final case class SubsetOf(column: String, dim: DataFrame,
                            dimCol: String, dimName: String)
    extends Constraint {
    val name = s"subset($column,$dimName.$dimCol)"
  }

  object Constraint {
    def notNull(c: String): RowCheck =
      RowCheck(s"not_null($c)", col(c).isNull)
    def inRange(c: String, lo: Double, hi: Double): RowCheck =
      RowCheck(s"in_range($c)",
        col(c).isNotNull && !(col(c) >= lo && col(c) <= hi))
    def accepted(c: String, values: Seq[String]): RowCheck =
      RowCheck(s"accepted($c)",
        col(c).isNotNull && !col(c).isin(values: _*))
    def matches(c: String, regex: String): RowCheck =
      RowCheck(s"matches($c)", col(c).isNotNull && !col(c).rlike(regex))
  }

  /** Evaluate constraints → (constraint_name, violations BIGINT).
    * All [[RowCheck]]s fuse into one aggregation pass; each [[Unique]]
    * is one two-level aggregation (Σ(group size − 1), NULL keys group
    * like values, matching GROUP BY semantics); each [[SubsetOf]] is
    * one anti-join count over non-NULL fact keys (AQE
    * broadcast-sized at runtime).
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "check needs at least one constraint")
    val rowChecks = constraints.collect { case r: RowCheck => r }
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (rowChecks.nonEmpty) {
      val aggs = rowChecks.zipWithIndex.map { case (r, i) =>
        sum(when(r.violated, 1L).otherwise(0L)).as(s"c$i")
      }
      val row = df.agg(aggs.head, aggs.tail: _*)
      val entries = rowChecks.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("constraint_name"),
          coalesce(col(s"c$i"), lit(0L)).cast(LongType).as("violations"))
      }
      parts += row.select(explode(array(entries: _*)).as("e"))
        .select(col("e.constraint_name"), col("e.violations"))
    }
    constraints.collect { case u: Unique => u }.foreach { u =>
      parts += df.groupBy(u.cols.map(col): _*).agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(col("n") - 1L), lit(0L)).cast(LongType)
          .as("violations"))
        .select(lit(u.name).as("constraint_name"), col("violations"))
    }
    constraints.collect { case s: SubsetOf => s }.foreach { s =>
      val facts = df.where(col(s.column).isNotNull)
        .select(col(s.column).as("k"))
      // no broadcast() hint: the dim frame is caller-supplied and
      // uncapped — AQE broadcasts it while small and falls back to a
      // shuffle join when it isn't, instead of OOMing the driver
      val dimKeys = s.dim.select(col(s.dimCol).as("k"))
      parts += facts.join(dimKeys, Seq("k"), "left_anti")
        .agg(coalesce(count(lit(1)), lit(0L)).cast(LongType)
          .as("violations"))
        .select(lit(s.name).as("constraint_name"), col("violations"))
    }
    parts.reduce(_ unionByName _)
  }
}
