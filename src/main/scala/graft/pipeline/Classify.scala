package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** fastText/DCLM-style quality classification — a multinomial Naive
  * Bayes text classifier over hashed unigram+bigram features (the
  * same feature map as [[Dsir]]; Joulin et al. 2016 "Bag of Tricks"
  * is the linear-classifier analogue). The canonical curation recipe
  * (GPT-3 App. A; DCLM, Li et al. 2024): label a small slice of the
  * corpus by ANY cheap signal — heuristics, an LLM judge, a curated
  * positive set — fit the classifier, then keep the top-scoring
  * documents. The labeler is a caller-supplied boolean [[Column]], so
  * any of those labeling strategies plugs in unchanged.
  *
  * vs [[Dsir]]: DSIR weights by the target/raw likelihood RATIO for
  * importance resampling (no prior, raw includes the target); NB
  * classifies pos vs neg as disjoint classes and carries the class
  * prior, giving calibrated-sign log-odds (`pred = logodds ≥ 0` is
  * the Bayes decision) — the shape a threshold-based quality filter
  * needs.
  *
  * 100 TB shape, same as DSIR's: fitting is one feature-hash scan
  * (map-side-combinable count aggregation with `buckets` distinct
  * keys) plus one pruned label-count scan (priors — reads only the
  * label's input columns, no text hashing); driver state is two
  * bounded arrays. Scoring is a broadcast-model codegen map pass; the
  * top-k cut is `orderBy.limit` = TakeOrderedAndProject per-partition
  * heaps. Nothing driver-side scales with the corpus.
  *
  * Engine-exact: with Laplace α = 1 every smoothed probability and
  * the prior odds are integer rationals, so the log2 posterior odds
  * is the signed exact fixed-point log2 ([[LmQuality.log2fix]]) of
  * ONE big-integer ratio — the Python oracle replays it bit-for-bit.
  * A featureless document scores the pure prior odds (no token
  * evidence), not 0 — NB's actual posterior.
  */
object Classify {

  /** Fitted NB model: per-class feature-instance counts (Laplace
    * applied at score time) plus document counts for the prior.
    * Arrays are `buckets`-sized — broadcastable by construction.
    */
  final class NbModel(val buckets: Int,
                      val posCounts: Array[Long], val posTotal: Long,
                      val negCounts: Array[Long], val negTotal: Long,
                      val posDocs: Long, val negDocs: Long)
      extends Serializable {
    def posDen: Long = posTotal + buckets.toLong
    def negDen: Long = negTotal + buckets.toLong
  }

  /** Fit from one labeled corpus: `labelCol` TRUE rows are the
    * positive class, the rest negative. ONE explode scan computes
    * both classes' bucket arrays (`count` minus `count_if` gives the
    * negative side for free); a second pruned scan (label columns
    * only — Parquet never materializes the text) counts documents
    * for the prior.
    */
  def fit(raw: DataFrame, labelCol: Column, textCol: String,
          buckets: Int = 1024): NbModel = {
    require(buckets > 0, "buckets must be positive")
    val pr = raw.agg(count_if(labelCol).as("p"), count(lit(1)).as("n"))
      .collect()(0)
    val posDocs = pr.getLong(0)
    val negDocs = pr.getLong(1) - posDocs
    val pc = new Array[Long](buckets)
    val nc = new Array[Long](buckets)
    raw.select(Dsir.featureHashesCol(col(textCol)).as("hs"),
        labelCol.as("is_p"))
      .select(explode(col("hs")).as("h"), col("is_p"))
      .groupBy(pmod(col("h"), lit(buckets.toLong)).as("b"))
      .agg(count(lit(1)).as("a"), count_if(col("is_p")).as("p"))
      .collect().foreach { row =>
        val b = row.getLong(0).toInt
        pc(b) = row.getLong(2)
        nc(b) = row.getLong(1) - row.getLong(2)
      }
    new NbModel(buckets, pc, pc.sum, nc, nc.sum, posDocs, negDocs)
  }

  /** Scoring kernel: exact fixed-point log2 posterior odds. With
    * instances b_1..b_n, smoothed class-conditionals
    * p_b = (pc_b+1)/(P+B), q_b = (nc_b+1)/(N+B) and smoothed prior
    * odds (posDocs+1)/(negDocs+1):
    *
    *   log2 O(pos|x) = log2( (posDocs+1) · Π (pc_{b_i}+1) · (N+B)^n
    *                       / ((negDocs+1) · Π (nc_{b_i}+1) · (P+B)^n) )
    *
    * — one big-integer ratio, signed [[LmQuality.log2fix]]. n = 0
    * degenerates to the prior odds alone.
    */
  def scoreKernel(text: String, m: NbModel): (Int, Long) = {
    val hs = Dsir.featureHashes(text)
    val n = hs.length
    var num = BigInt(m.posDocs + 1L)
    var den = BigInt(m.negDocs + 1L)
    var i = 0
    while (i < n) {
      val b = Dsir.bucketOf(hs(i), m.buckets)
      num *= BigInt(m.posCounts(b) + 1L)
      den *= BigInt(m.negCounts(b) + 1L)
      i += 1
    }
    if (n > 0) {
      num *= BigInt(m.negDen).pow(n)
      den *= BigInt(m.posDen).pow(n)
    }
    val fp =
      if (num >= den) LmQuality.log2fix(num, den)
      else -LmQuality.log2fix(den, num)
    (n, fp)
  }

  /** Column API: struct(n_feats INT, logodds_fp BIGINT) per row. */
  def nbLogOdds(text: Column, m: NbModel): Column =
    graft.functions.ColumnBridge.column(
      NbLogOdds(graft.functions.ColumnBridge.expression(text), m))

  /** Per-document prediction: (doc, n_feats, logodds_fp, pred) with
    * `pred` the Bayes decision logodds ≥ 0.
    */
  def predict(df: DataFrame, textCol: String, idCol: String,
              m: NbModel): DataFrame =
    df.select(col(idCol).as("doc"), nbLogOdds(col(textCol), m).as("s"))
      .select(col("doc"), col("s._1").as("n_feats"),
        col("s._2").as("logodds_fp"))
      .withColumn("pred", col("logodds_fp") >= 0L)

  /** Keep the k documents the classifier is most confident are
    * positive (the DCLM "top fraction by classifier score" cut; ties
    * by doc id). TakeOrderedAndProject — per-partition heaps.
    */
  def selectTopK(df: DataFrame, textCol: String, idCol: String,
                 m: NbModel, k: Int): DataFrame =
    predict(df, textCol, idCol, m)
      .orderBy(col("logodds_fp").desc, col("doc"))
      .limit(k)
}

/** Codegen'd scoring expression: String in, struct(n_feats,
  * logodds_fp) out, model shipped as a plan reference object (the
  * [[DsirScore]] pattern).
  */
case class NbLogOdds(child: Expression, m: Classify.NbModel)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = StructType(Seq(
    StructField("_1", IntegerType, nullable = false),
    StructField("_2", LongType, nullable = false)))
  override def prettyName: String = "nb_log_odds"

  override def nullSafeEval(t: Any): Any = NbLogOdds.evalRow(t.toString, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nbModel", m,
      classOf[Classify.NbModel].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.pipeline.NbLogOdds.evalRow($t.toString(), $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NbLogOdds {
  /** Codegen entry point (generated Java cannot destructure tuples). */
  def evalRow(text: String, m: Classify.NbModel)
      : org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val (n, fp) = Classify.scoreKernel(text, m)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, fp))
  }
}
