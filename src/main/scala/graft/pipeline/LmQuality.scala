package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Language-model quality scoring — the CCNet/RefinedWeb-style filter
  * (Wenzek et al. 2020, arXiv:1911.00359 score documents by LM
  * perplexity and keep the fluent ones): an add-one-smoothed word
  * BIGRAM model trained on a reference corpus, documents scored by
  * cross-entropy (bits per bigram). A 5-gram KenLM is the production
  * instance; the bigram form keeps the model broadcastable and the
  * semantics fully specified here.
  *
  * Engine-exact by construction, like every scorer in this repo: with
  * α = 1 each bigram probability is an integer RATIONAL
  * (cb+1)/(cctx+V'), a document's total log2-probability is the log2
  * of one big-integer ratio, and that log2 is computed by an EXACT
  * fixed-point square-and-compare ([[LmQuality.log2fix]]) — floor
  * divisions and shifts only, no libm, so any engine (the Python
  * oracle) replays the score bit-for-bit. No float accumulates across
  * bigrams at all; the only floating point is one final division by
  * the bigram count, exact-input IEEE both sides.
  */
object LmQuality {

  /** Broadcastable bigram model: token → id (OOV → `unkId` = vocab
    * size), per-context bigram-start counts, and the retained bigram
    * counts keyed by (id1 << 32 | id2).
    */
  final class BigramLm(val vocab: java.util.HashMap[String, Integer],
                       val ctxCounts: Array[Long],
                       val bigrams: java.util.HashMap[java.lang.Long, java.lang.Long])
      extends Serializable {
    def unkId: Int = ctxCounts.length - 1
    /** V' — the smoothing denominator's event count: vocab + unk. */
    def vPrime: Long = ctxCounts.length.toLong
  }

  /** Exact fixed-point floor(log2(a/b) · 2^fracBits) for a ≥ b > 0:
    * integer part from a bit-length walk, fraction bits by mantissa
    * square-and-compare with the mantissa held at `Prec` bits and
    * floor-truncated every step — shifts and floor divisions only, so
    * the value is a deterministic pure function of (a, b) that any
    * big-integer engine replays exactly. (Truncation makes this a
    * DEFINED approximation of log2, a hair below the true value; the
    * contract is the function, not the real number.)
    */
  val FracBits = 20
  private val Prec = 64

  def log2fix(a: BigInt, b: BigInt): Long = {
    require(a.signum > 0 && b.signum > 0 && a >= b, "log2fix needs a >= b > 0")
    // integer part: largest k with b << k <= a
    var k = a.bitLength - b.bitLength
    if ((b << k) > a) k -= 1
    // mantissa m = floor((a << Prec) / (b << k)) in [2^Prec, 2^(Prec+1))
    var m = (a << Prec) / (b << k)
    var out = k.toLong
    var i = 0
    while (i < FracBits) {
      m = (m * m) >> Prec
      out <<= 1
      if (m.bitLength > Prec + 1) { m = m >> 1; out |= 1L }
      i += 1
    }
    out
  }

  /** Train the bigram model. Bounded driver state by construction:
    * `vocabSize` unigrams (ties to the lexicographically smaller
    * token), exact per-context bigram-start counts over the UNK-mapped
    * stream (≤ V+1 rows), and the `maxBigrams` most frequent mapped
    * bigrams (ties to the smaller (id1, id2)) — dropping tail bigrams
    * only moves their probability to the smoothed floor, which is the
    * cap's documented meaning. Token mapping happens via a broadcast
    * vocab join, bigram assembly via a (doc, pos+1) self-join — plain
    * relational passes, no driver scan of the corpus.
    */
  def train(df: DataFrame, textCol: String, idCol: String,
            vocabSize: Int = 50000, maxBigrams: Int = 1000000): BigramLm = {
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(col(idCol).as("doc"),
      posexplode(filter(split(col(textCol), " "), t => t =!= ""))
        .as(Seq("pos", "tok")))
    val vocabRows = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok")).collect().map(_.getString(0))
    val vocab = new java.util.HashMap[String, Integer]()
    vocabRows.zipWithIndex.foreach { case (t, i) => vocab.put(t, i) }
    val unkId = vocabRows.length
    val vocabDf = vocabRows.zipWithIndex.toSeq.toDF("tok", "vid")
    val mapped = toks.join(broadcast(vocabDf), Seq("tok"), "left")
      .select(col("doc"), col("pos"),
        coalesce(col("vid"), lit(unkId)).as("vid"))
    val big = mapped.as("a").join(mapped.as("b"),
        col("a.doc") === col("b.doc") && col("b.pos") === col("a.pos") + 1)
      .select(col("a.vid").as("v1"), col("b.vid").as("v2"))
    val bigCounts = big.groupBy(col("v1"), col("v2")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // two consumers: ctx totals + the top-M cap
    val ctx = new Array[Long](unkId + 1)
    bigCounts.groupBy(col("v1")).agg(sum(col("c")).as("t")).collect()
      .foreach(r => ctx(r.getInt(0)) = r.getLong(1))
    val bigrams = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    bigCounts.orderBy(col("c").desc, col("v1").asc, col("v2").asc)
      .limit(maxBigrams).collect().foreach { r =>
        bigrams.put((r.getInt(0).toLong << 32) | r.getInt(1).toLong, r.getLong(2))
      }
    graft.core.Pinned.release(bigCounts)
    new BigramLm(vocab, ctx, bigrams)
  }

  /** Shared scoring kernel: tokens → ids, one exact rational product
    * over the document's bigrams, one [[log2fix]]. Returns
    * (nBigrams, totalXentFp) — totalXentFp = floor(-log2 P(doc) ·
    * 2^FracBits), 0 for docs with fewer than 2 tokens.
    */
  def scoreKernel(text: String, lm: BigramLm): (Int, Long) = {
    val raw = text.split(" ")
    var n = 0
    val ids = new Array[Int](raw.length)
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) {
        val v = lm.vocab.get(raw(i))
        ids(n) = if (v == null) lm.unkId else v.intValue()
        n += 1
      }
      i += 1
    }
    if (n < 2) return (0, 0L)
    var num = BigInt(1) // Π (cb + 1)
    var den = BigInt(1) // Π (cctx + V')
    var j = 1
    while (j < n) {
      val key = (ids(j - 1).toLong << 32) | ids(j).toLong
      val cb = lm.bigrams.get(key)
      num *= BigInt((if (cb == null) 0L else cb.longValue()) + 1L)
      den *= BigInt(lm.ctxCounts(ids(j - 1)) + lm.vPrime)
      j += 1
    }
    (n - 1, log2fix(den, num)) // -log2(num/den) = log2(den/num), den >= num
  }

  /** Column API: struct(n_bigrams INT, xent_fp BIGINT) per row. */
  def bigramXent(text: Column, lm: BigramLm): Column =
    graft.functions.ColumnBridge.column(
      BigramXent(graft.functions.ColumnBridge.expression(text), lm))

  /** Cross-entropy scores for every document: (doc, n_bigrams,
    * xent_fp, xent) — xent = bits per bigram as a double (two
    * exact-input IEEE divisions), NULL-free, 0.0 for sub-2-token docs.
    */
  def crossEntropy(df: DataFrame, textCol: String, idCol: String,
                   lm: BigramLm): DataFrame =
    df.select(col(idCol).as("doc"),
        bigramXent(col(textCol), lm).as("s"))
      .select(col("doc"), col("s._1").as("n_bigrams"),
        col("s._2").as("xent_fp"))
      .withColumn("xent",
        when(col("n_bigrams") > 0,
          col("xent_fp").cast(DoubleType) / lit((1L << FracBits).toDouble) /
            col("n_bigrams").cast(DoubleType))
          .otherwise(lit(0.0)))

  /** CCNet-style perplexity bucketing (Wenzek et al., LREC 2020):
    * documents split into head / middle / tail by per-bigram LM
    * cross-entropy thresholds at the p1-th / p2-th EXACT percentiles
    * of the corpus score distribution — the quality-stratification
    * step CCNet runs before sampling by bucket.
    *
    * The score is the exact fixed-point per-bigram cross-entropy
    * `avg_fp = floor(xent_fp · 2^10 / n_bigrams)` (overflow-safe
    * [[graft.functions.MulDivFloor]]; 0 for sub-2-token docs, which
    * land in head) — a pure integer function any engine replays.
    * Thresholds come from [[OrderStats.exactPercentiles]] (lower
    * rule over (value, doc)), a ≤2-row driver collect; assignment is
    * a map-side threshold compare with ties taking the lower bucket,
    * so equal-scoring documents always share a bucket.
    *
    * 100 TB shape: one codegen scoring pass + the distributed-rank
    * percentile selection (range partitions, never a one-reducer
    * window) + a broadcast 2-value compare. Output: (doc, n_bigrams,
    * xent_fp, xent, avg_fp, bucket).
    */
  def perplexityBuckets(df: DataFrame, textCol: String, idCol: String,
                        lm: BigramLm, p1: Int = 33, p2: Int = 66): DataFrame = {
    require(0 <= p1 && p1 <= p2 && p2 <= 100,
      s"need 0 <= p1 <= p2 <= 100, got ($p1, $p2)")
    // pinned once: the percentile pass below EXECUTES the scoring
    // plan, and the returned frame is consumed again by the caller —
    // without the checkpoint that second consumption re-runs the full
    // codegen scoring scan (the probeRaw pattern), making the "one
    // scoring pass" claim off by a whole corpus scan
    val scored = crossEntropy(df, textCol, idCol, lm)
      .withColumn("avg_fp",
        when(col("n_bigrams") > 0,
          graft.functions.MulDivFloor.column(col("xent_fp"), lit(1024L),
            col("n_bigrams").cast(LongType)))
          .otherwise(lit(0L)))
      .localCheckpoint(true)
    val th = OrderStats.exactPercentiles(df.sparkSession,
        scored.withColumn("g", lit("all")), "g", "avg_fp", "doc",
        Seq(p1, p2).distinct)
      .collect().map(r => r.getAs[Int]("pct") -> r.getAs[Long]("v")).toMap
    if (th.isEmpty) scored.withColumn("bucket", lit("head")) // empty corpus
    else scored.withColumn("bucket",
      when(col("avg_fp") <= lit(th(p1)), "head")
        .when(col("avg_fp") <= lit(th(p2)), "middle")
        .otherwise(lit("tail")))
  }
}

/** Per-row bigram cross-entropy under a broadcast [[LmQuality.BigramLm]]
  * — codegen'd, the model rides as a plan reference object, the kernel
  * is [[LmQuality.scoreKernel]] (exact integer arithmetic, no libm).
  * Struct fields use tuple-encoder names (_1 n_bigrams, _2 xent_fp).
  */
case class BigramXent(child: Expression, lm: LmQuality.BigramLm)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = StructType(Seq(
    StructField("_1", IntegerType, nullable = false),
    StructField("_2", LongType, nullable = false)))
  override def prettyName: String = "bigram_xent"

  override def nullSafeEval(t: Any): Any = {
    val (n, fp) = LmQuality.scoreKernel(t.toString, lm)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, fp))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("bigramLm", lm,
      classOf[LmQuality.BigramLm].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.pipeline.BigramXent.evalRow($t.toString(), $m);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BigramXent {
  /** Codegen entry point (generated Java cannot destructure tuples). */
  def evalRow(text: String, lm: LmQuality.BigramLm)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val (n, fp) = LmQuality.scoreKernel(text, lm)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, fp))
  }
}
