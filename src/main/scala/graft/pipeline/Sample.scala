package graft.pipeline

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Weighted sampling without replacement — the exponential-race form
  * of Efraimidis & Spirakis 2006 ("Weighted random sampling with a
  * reservoir"): item i wins with key −ln(u_i)/w_i, the k SMALLEST
  * keys are the sample, and inclusion probability is proportional to
  * weight at each of the k draws.
  *
  * Engine-exact arithmetic: u_i is the splitmix64 mix of (id, seed)
  * ([[graft.functions.Splitmix64]], the engine's portable per-row
  * randomness), the logarithm is the exact fixed-point
  * [[LmQuality.log2fix]] (log base does not change the ranking), and
  * the weight division is a long floor division after a 2^20 scale-up
  * — so the key is a deterministic pure integer function of
  * (id, weight, seed) that the Python oracle replays bit-for-bit. No
  * libm, no RNG stream ordering.
  *
  * 100 TB shape: ONE map pass computes the key inside whole-stage
  * codegen (the race expression below), then the bounded-heap
  * [[graft.functions.TopKByScore]] aggregate cuts the k winners —
  * O(k) state, map-side partials, only k rows per group cross the
  * shuffle. No sort, no window, no full-key shuffle. The per-stratum
  * variant is the same aggregate keyed by the stratum column.
  */
object Sample {

  /** Fixed-point A-ES race key: floor(log2fix(2^62, u) · 2^20 / w),
    * u = (splitmix64(id + seed) >>> 2) + 1 ∈ [1, 2^62]. Smaller key
    * = earlier exponential arrival = sampled first. Weights must be
    * ≥ 1 (a zero weight would mean "never sample" — callers clamp).
    * log2fix(2^62, u) ≤ 62·2^20 < 2^27, so the 2^20 scale-up stays
    * far under 2^63 and the division loses nothing it shouldn't.
    */
  def keyKernel(id: Long, w: Long, seed: Long): Long = {
    require(w >= 1L, s"weight must be >= 1, got $w")
    val u = (graft.functions.Splitmix64.mix(id + seed) >>> 2) + 1L
    val race = LmQuality.log2fix(BigInt(1) << 62, BigInt(u))
    (race << 20) / w
  }

  /** Column form of [[keyKernel]] — codegen'd, stays in the map
    * stage.
    */
  def raceKey(id: Column, w: Column, seed: Long): Column =
    graft.functions.ColumnBridge.column(RaceKey(
      graft.functions.ColumnBridge.expression(id),
      graft.functions.ColumnBridge.expression(w), seed))

  /** Global weighted sample without replacement: the k rows with the
    * smallest race keys. Returns (doc, w, key_fp, rk), rk 1-based in
    * draw order (key asc, doc asc on ties).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: Long): DataFrame = {
    require(k > 0, "k must be positive")
    val keyed = df.select(col(idCol).as("doc"),
        col(weightCol).cast(LongType).as("w"))
      .withColumn("key_fp", raceKey(col("doc"), col("w"), seed))
    // heap keeps HIGHEST score with ties to lower id — negate the key
    // so the smallest keys win; |key_fp| < 2^47 so the double
    // round-trip through the heap is exact. The weight rides the heap
    // as the tag payload, so no winners-back-to-input re-join (which
    // would recompute the un-pinned upstream a second time).
    keyed
      .agg(graft.functions.TopKByScore.topKByTag(
        -col("key_fp").cast(DoubleType), col("doc"), col("w"), k).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("hit.id").as("doc"), col("hit.tag").as("w"),
        (-col("hit.score")).cast(LongType).as("key_fp"),
        (col("pos") + 1).cast(IntegerType).as("rk"))
  }

  /** Per-stratum weighted sample: k winners within EACH stratum —
    * the same bounded heap keyed by the stratum column (one O(k)
    * buffer per stratum, never a per-stratum sort).
    */
  def weightedSampleStratified(df: DataFrame, idCol: String,
                               stratumCol: String, weightCol: String,
                               k: Int, seed: Long): DataFrame = {
    require(k > 0, "k must be positive")
    val keyed = df.select(col(idCol).as("doc"),
        col(stratumCol).as("stratum"),
        col(weightCol).cast(LongType).as("w"))
      .withColumn("key_fp", raceKey(col("doc"), col("w"), seed))
    keyed.groupBy(col("stratum"))
      .agg(graft.functions.TopKByScore.topKBy(
        -col("key_fp").cast(DoubleType), col("doc"), k).as("top"))
      .select(col("stratum"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("stratum"), col("hit.id").as("doc"),
        (-col("hit.score")).cast(LongType).as("key_fp"),
        (col("pos") + 1).cast(IntegerType).as("rk"))
  }
}

/** `race_key(id, w)` — the exact fixed-point A-ES key of
  * [[Sample.keyKernel]] as a codegen'd expression (a static kernel
  * call; the BigInt log walk is 20 bounded square-and-compare steps,
  * map-side, no shuffle state).
  */
case class RaceKey(left: Expression, right: Expression, seed: Long)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BIGINT, BIGINT), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType
  override def prettyName: String = "race_key"

  override def nullSafeEval(id: Any, w: Any): Any =
    Sample.keyKernel(id.asInstanceOf[Long], w.asInstanceOf[Long], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (id, w) =>
      s"${ev.value} = graft.pipeline.Sample.keyKernel($id, $w, ${seed}L);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RaceKey {
  /** SQL-surface builder shared by GraftSql and GraftExtensions:
    * `race_key(id, w)` or `race_key(id, w, seedLiteral)` — the seed
    * parameterizes generated code, so it must be a literal.
    */
  def fromArgs(exprs: Seq[Expression]): RaceKey = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    exprs match {
      case Seq(id, w) => RaceKey(id, w, 0L)
      case Seq(id, w, Literal(s, LongType)) =>
        RaceKey(id, w, s.asInstanceOf[Long])
      case Seq(id, w, Literal(s, IntegerType)) =>
        RaceKey(id, w, s.asInstanceOf[Int].toLong)
      case Seq(id, w, Literal(s, ShortType)) =>
        RaceKey(id, w, s.asInstanceOf[Short].toLong)
      case Seq(id, w, Literal(s, ByteType)) =>
        RaceKey(id, w, s.asInstanceOf[Byte].toLong)
      case Seq(_, _, other) => throw new IllegalArgumentException(
        s"race_key seed must be an integral literal, got ${other.sql}")
      case _ => throw new IllegalArgumentException(
        s"race_key expects 2 or 3 arguments, got ${exprs.size}")
    }
  }
}
