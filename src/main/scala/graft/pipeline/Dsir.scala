package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DSIR-style data selection — importance resampling over hashed
  * n-gram features (Xie et al., "Data Selection for Language Models
  * via Importance Resampling", NeurIPS 2023): fit bag-of-hashed-ngram
  * multinomials over a TARGET corpus (the domain you want more of)
  * and the RAW corpus (what you have), weight every raw document by
  * its log likelihood ratio, and take the documents that look most
  * like the target. The published recipe hashes unigrams + bigrams
  * into a fixed bucket count, Laplace-smooths both distributions, and
  * samples via Gumbel top-k; this implementation keeps those
  * semantics with the engine's exactness conventions.
  *
  * 100 TB shape: fitting is ONE map-side-combinable aggregation per
  * corpus with `buckets` distinct keys (driver state = two
  * bucket-count arrays, size-bounded by construction — NOT by the
  * data); scoring is a single broadcast-model map pass (a codegen'd
  * expression, no shuffle); selection is an `orderBy.limit` top-k
  * (TakeOrderedAndProject — per-partition heaps, never a full sort).
  * Nothing driver-side scales with corpus size.
  *
  * Engine-exact like every scorer in this repo: with α = 1 both
  * smoothed probabilities are integer rationals, so a document's log
  * weight is the log2 of one big-integer ratio, computed by the EXACT
  * fixed-point [[LmQuality.log2fix]] — no libm in the checked output,
  * and the Python oracle replays the score bit-for-bit. The Gumbel
  * variant ([[resample]]) perturbs with floats and is therefore
  * spec-asserted (determinism, partition invariance, weight bias),
  * not oracle-hashed — the repo's standing convention for
  * randomized operators.
  */
object Dsir {

  /** Fitted importance model: exact Laplace-unsmoothed instance
    * counts per hash bucket for the target and raw corpora. Arrays
    * are `buckets`-sized — broadcastable by construction.
    */
  final class DsirModel(val buckets: Int,
                        val targetCounts: Array[Long], val targetTotal: Long,
                        val rawCounts: Array[Long], val rawTotal: Long)
      extends Serializable {
    /** Smoothed-denominator totals: N + B and M + B. */
    def targetDen: Long = targetTotal + buckets.toLong
    def rawDen: Long = rawTotal + buckets.toLong
  }

  /** Feature-instance hashes of one document, in document order:
    * unigram then bigram token shingles (the paper's feature set),
    * via the engine's shared rolling-hash kernel
    * ([[graft.functions.ShingleHashes]] — the same function every
    * dedup golden mirrors).
    */
  private[graft] def featureHashes(text: String): Array[Long] = {
    val u = graft.functions.ShingleHashes.compute(text, 1).toLongArray()
    val b = graft.functions.ShingleHashes.compute(text, 2).toLongArray()
    val out = new Array[Long](u.length + b.length)
    System.arraycopy(u, 0, out, 0, u.length)
    System.arraycopy(b, 0, out, u.length, b.length)
    out
  }

  /** Column form of [[featureHashes]] for the distributed fit path. */
  private[pipeline] def featureHashesCol(text: Column): Column = {
    val t = coalesce(text, lit(""))
    concat(graft.functions.HashFunctions.shingleHashes(t, 1),
      graft.functions.HashFunctions.shingleHashes(t, 2))
  }

  private[pipeline] def bucketOf(h: Long, buckets: Int): Int = {
    val m = (h % buckets).toInt
    if (m < 0) m + buckets else m
  }

  /** Fit one corpus's bucket-count array: explode feature hashes,
    * bucket by nonneg mod, ONE count aggregation with `buckets`
    * distinct keys (fully map-side combinable), collect the bounded
    * array. Works at any corpus size — the shuffle carries at most
    * `buckets` rows per map partition.
    */
  private[graft] def fitCounts(df: DataFrame, textCol: String,
                               buckets: Int): (Array[Long], Long) = {
    val counts = new Array[Long](buckets)
    df.select(explode(featureHashesCol(col(textCol))).as("h"))
      .select(pmod(col("h"), lit(buckets.toLong)).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
      .collect().foreach(r => counts(r.getLong(0).toInt) = r.getLong(1))
    (counts, counts.sum)
  }

  /** Fit the importance model from a target and a raw corpus. */
  def fit(target: DataFrame, raw: DataFrame, textCol: String,
          buckets: Int = 1024): DsirModel = {
    require(buckets > 0, "buckets must be positive")
    val (tc, tt) = fitCounts(target, textCol, buckets)
    val (rc, rt) = fitCounts(raw, textCol, buckets)
    new DsirModel(buckets, tc, tt, rc, rt)
  }

  /** [[fit]] for the common target ⊆ raw case (the target is a
    * labeled subset of the corpus being weighted): ONE corpus scan
    * computes both bucket arrays — `count` for raw, `count_if(pred)`
    * for target — instead of hashing the raw side twice. At 100 TB
    * the fit cost IS the raw scan, so this halves it. Exactly
    * equivalent to `fit(raw.where(targetPred), raw, ...)` by
    * construction (same counts, same totals).
    */
  def fitSplit(raw: DataFrame, targetPred: Column, textCol: String,
               buckets: Int = 1024): DsirModel = {
    require(buckets > 0, "buckets must be positive")
    val tc = new Array[Long](buckets)
    val rc = new Array[Long](buckets)
    raw.select(featureHashesCol(col(textCol)).as("hs"),
        targetPred.as("is_t"))
      .select(explode(col("hs")).as("h"), col("is_t"))
      .groupBy(pmod(col("h"), lit(buckets.toLong)).as("b"))
      .agg(count(lit(1)).as("r"), count_if(col("is_t")).as("t"))
      .collect().foreach { row =>
        val b = row.getLong(0).toInt
        rc(b) = row.getLong(1)
        tc(b) = row.getLong(2)
      }
    new DsirModel(buckets, tc, tc.sum, rc, rc.sum)
  }

  /** Shared scoring kernel: the document's exact fixed-point log2
    * importance weight. With instances b_1..b_n and Laplace-smoothed
    * p_b = (tc_b+1)/(N+B), q_b = (rc_b+1)/(M+B):
    *
    *   log2 w(x) = log2( Π (tc_{b_i}+1) · (M+B)^n
    *                   / (Π (rc_{b_i}+1) · (N+B)^n) )
    *
    * — one big-integer ratio, signed [[LmQuality.log2fix]] (positive
    * branch floor-truncated, negative branch its exact mirror).
    * Returns (nInstances, scoreFp = that log2 · 2^FracBits); (0, 0)
    * for featureless documents (w(x) = 1: no evidence either way).
    */
  def scoreKernel(text: String, m: DsirModel): (Int, Long) = {
    val hs = featureHashes(text)
    val n = hs.length
    if (n == 0) return (0, 0L)
    var num = BigInt(1) // Π (tc_b + 1)
    var den = BigInt(1) // Π (rc_b + 1)
    var i = 0
    while (i < n) {
      val b = bucketOf(hs(i), m.buckets)
      num *= BigInt(m.targetCounts(b) + 1L)
      den *= BigInt(m.rawCounts(b) + 1L)
      i += 1
    }
    val a = num * BigInt(m.rawDen).pow(n)
    val d = den * BigInt(m.targetDen).pow(n)
    val fp =
      if (a >= d) LmQuality.log2fix(a, d)
      else -LmQuality.log2fix(d, a)
    (n, fp)
  }

  /** Column API: struct(n_feats INT, logw_fp BIGINT) per row. */
  def dsirScore(text: Column, m: DsirModel): Column =
    graft.functions.ColumnBridge.column(
      DsirScore(graft.functions.ColumnBridge.expression(text), m))

  /** Log importance weights for every document: (doc, n_feats,
    * logw_fp, logw) — logw = log2 w(x) as a double (one exact-input
    * IEEE division), 0.0 for featureless docs.
    */
  def weights(df: DataFrame, textCol: String, idCol: String,
              m: DsirModel): DataFrame =
    df.select(col(idCol).as("doc"), dsirScore(col(textCol), m).as("s"))
      .select(col("doc"), col("s._1").as("n_feats"),
        col("s._2").as("logw_fp"))
      .withColumn("logw",
        col("logw_fp").cast(DoubleType) /
          lit((1L << LmQuality.FracBits).toDouble))

  /** Deterministic top-k selection by importance weight (the paper's
    * "top-k" baseline; ties broken by doc id). `orderBy.limit`
    * compiles to TakeOrderedAndProject — per-partition heaps of k,
    * no global sort.
    */
  def selectTopK(df: DataFrame, textCol: String, idCol: String,
                 m: DsirModel, k: Int): DataFrame =
    weights(df, textCol, idCol, m)
      .orderBy(col("logw_fp").desc, col("doc"))
      .limit(k)

  /** Gumbel top-k importance RESAMPLING (the paper's sampling rule):
    * perturb each document's log weight with an independent Gumbel
    * draw and take the k largest — exactly sampling-without-
    * replacement proportional to w(x). The Gumbel uses the engine's
    * deterministic uniform ([[graft.functions.HashFunctions.unitUniform]]
    * — splitmix64 of (id, seed), top 53 bits), so the draw is a pure
    * function of (doc id, seed): reproducible across runs AND
    * partitionings. log2-domain: g/ln2 added to logw.
    */
  def resample(df: DataFrame, textCol: String, idCol: String,
               m: DsirModel, k: Int, seed: Long): DataFrame = {
    val u = graft.functions.HashFunctions.unitUniform(col("doc"), seed)
    weights(df, textCol, idCol, m)
      .withColumn("gumbel", -log(-log(u)) / lit(math.log(2.0)))
      .withColumn("score", col("logw") + col("gumbel"))
      .orderBy(col("score").desc, col("doc"))
      .limit(k)
  }
}

/** Codegen'd scoring expression: one String in, struct(n_feats,
  * logw_fp) out, model held as a plan reference object (Spark ships
  * it in the task binary — same pattern as [[BigramXent]]).
  */
case class DsirScore(child: Expression, m: Dsir.DsirModel)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = StructType(Seq(
    StructField("_1", IntegerType, nullable = false),
    StructField("_2", LongType, nullable = false)))
  override def prettyName: String = "dsir_score"

  override def nullSafeEval(t: Any): Any = {
    val (n, fp) = Dsir.scoreKernel(t.toString, m)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, fp))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirModel", m,
      classOf[Dsir.DsirModel].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.pipeline.DsirScore.evalRow($t.toString(), $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DsirScore {
  /** Codegen entry point (generated Java cannot destructure tuples). */
  def evalRow(text: String, m: Dsir.DsirModel)
      : org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val (n, fp) = Dsir.scoreKernel(text, m)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, fp))
  }
}
