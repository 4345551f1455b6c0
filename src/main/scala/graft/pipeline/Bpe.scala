package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** BPE tokenizer training + encoding (Sennrich, Haddow & Birch 2016,
  * arXiv:1508.07909) — the tokenizer-training step of an LLM data
  * pipeline, completing the tokenizer family next to vocabulary
  * induction (`TextAnalysis.vocabulary`) and the BPE-ish token-count
  * proxy.
  *
  * 100 TB shape: BPE trains on the WORD-FREQUENCY table, not the
  * corpus stream — one distributed map-side-combinable word-count
  * aggregation, then a driver merge loop over the bounded vocabulary
  * (the language's word list; for open-vocabulary web text, cap it
  * first with [[HeavyHitters.topTerms]] / a frequency cutoff — the
  * standard practice). Encoding is a broadcast-model codegen map
  * pass: the merge table ships once per task, each row re-tokenizes
  * locally, no shuffle.
  *
  * Determinism (both engines replay bit-for-bit): pair selection is
  * max count with LEXICOGRAPHIC (left, right) tie-break; merge
  * application is non-overlapping left-to-right; encoding merges the
  * lowest-rank adjacent pair first (leftmost on rank ties) — all
  * integer/string ops, no floats anywhere.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Learned merge table, rank order. */
  final class BpeModel(val merges: Array[(String, String)])
      extends Serializable {
    @transient lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.length * 2)
      merges.zipWithIndex.foreach { case ((l, r), i) =>
        m.put(l + "\u0000" + r, i)
      }
      m
    }
  }

  private def symbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ EndOfWord

  /** Driver merge loop over a word-frequency table: returns
    * (rank, left, right, pairCount) for up to `numMerges` merges,
    * stopping early when the best pair drops below `minPairCount`.
    */
  def trainFromCounts(wordCounts: Map[String, Long], numMerges: Int,
                      minPairCount: Long = 2L): Seq[(Int, String, String, Long)] = {
    require(numMerges > 0, "numMerges must be positive")
    var vocab: Vector[(Vector[String], Long)] =
      wordCounts.toVector.sortBy(_._1).map { case (w, c) => (symbols(w), c) }
    val out = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 0
    while (rank < numMerges) {
      val pairs = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (s, c) =>
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          pairs.update(k, pairs.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairs.isEmpty) return out.toSeq
      val ((l, r), cnt) = pairs.minBy { case ((a, b), c) => (-c, a, b) }
      if (cnt < minPairCount) return out.toSeq
      out += ((rank, l, r, cnt))
      vocab = vocab.map { case (s, c) => (mergeAll(s, l, r), c) }
      rank += 1
    }
    out.toSeq
  }

  /** Merge all non-overlapping (l, r) occurrences, left to right. */
  private[pipeline] def mergeAll(s: Vector[String], l: String,
                                 r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += s(i); i += 1 }
    }
    b.result()
  }

  /** Distributed fit: ONE word-count aggregation feeds the driver
    * loop. The distinct-word table must be driver-boundable (the
    * operator contract; cap open vocabularies first).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L): BpeModel = {
    val wc = df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    new BpeModel(trainFromCounts(wc, numMerges, minPairCount)
      .map(m => (m._2, m._3)).toArray)
  }

  /** [[train]] for OPEN vocabularies (web text at 100 TB): the word
    * table is first capped to the `maxVocab` most frequent words via
    * the two-pass heavy-hitters design (Misra-Gries candidates with
    * 4× capacity, exact re-count, exact top-maxVocab cut) so the
    * driver only ever sees maxVocab rows — the merge loop then runs
    * on true counts of the head vocabulary, which is exactly what
    * production tokenizer training does (rare-word tails contribute
    * no merges).
    */
  def trainCapped(spark: SparkSession, df: DataFrame, textCol: String,
                  numMerges: Int, maxVocab: Int,
                  minPairCount: Long = 2L): BpeModel =
    new BpeModel(cappedMerges(spark, df, textCol, numMerges, maxVocab,
      minPairCount).map(m => (m._2, m._3)).toArray)

  /** The capped merge table as a DataFrame — [[trainTable]] for the
    * open-vocabulary path (this is the variant whose shape survives
    * 100 TB: the driver only ever sees maxVocab rows).
    */
  def trainCappedTable(spark: SparkSession, df: DataFrame, textCol: String,
                       numMerges: Int, maxVocab: Int,
                       minPairCount: Long = 2L): DataFrame = {
    import spark.implicits._
    cappedMerges(spark, df, textCol, numMerges, maxVocab, minPairCount)
      .toDF("rank", "left", "right", "pair_count")
  }

  private def cappedMerges(spark: SparkSession, df: DataFrame,
                           textCol: String, numMerges: Int, maxVocab: Int,
                           minPairCount: Long): Seq[(Int, String, String, Long)] = {
    require(maxVocab > 0, "maxVocab must be positive")
    val wc = HeavyHitters.topTerms(spark, df, textCol, k = maxVocab,
        capacity = 4 * maxVocab)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    trainFromCounts(wc, numMerges, minPairCount)
  }

  /** The merge table as a DataFrame (rank, left, right, pair_count) —
    * the trained artifact a tokenizer build would export.
    */
  def trainTable(spark: SparkSession, df: DataFrame, textCol: String,
                 numMerges: Int, minPairCount: Long = 2L): DataFrame = {
    val wc = df.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    import spark.implicits._
    trainFromCounts(wc, numMerges, minPairCount)
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Encode one word: repeatedly merge the lowest-rank adjacent pair
    * (leftmost on rank ties) until no learned pair remains.
    */
  private[pipeline] def encodeWord(word: String, m: BpeModel): Vector[String] = {
    var s = symbols(word)
    var done = false
    while (!done && s.length > 1) {
      var bestRank = Int.MaxValue
      var bestL: String = null
      var bestR: String = null
      var i = 0
      while (i < s.length - 1) {
        val r = m.ranks.get(s(i) + "\u0000" + s(i + 1))
        if (r != null && r < bestRank) {
          bestRank = r; bestL = s(i); bestR = s(i + 1)
        }
        i += 1
      }
      if (bestL == null) done = true
      else s = mergeAll(s, bestL, bestR)
    }
    s
  }

  /** Kernel: total BPE token count of a text (sum of per-word symbol
    * counts after merging).
    */
  def countKernel(text: String, m: BpeModel): Long = {
    var n = 0L
    text.split(" ", -1).foreach(w => n += encodeWord(w, m).length)
    n
  }

  /** Column API: BPE token count under a trained model (codegen'd,
    * broadcast-model map pass).
    */
  def bpeTokenCount(text: Column, m: BpeModel): Column =
    graft.functions.ColumnBridge.column(
      BpeCount(graft.functions.ColumnBridge.expression(
        coalesce(text, lit(""))), m))
}

/** Codegen'd BPE token-count expression: String in, Long out, model
  * shipped as a plan reference object.
  */
case class BpeCount(child: Expression, m: Bpe.BpeModel)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(t: Any): Any =
    Bpe.countKernel(t.toString, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeModel", m,
      classOf[Bpe.BpeModel].getName)
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.pipeline.Bpe.countKernel($t.toString(), $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
