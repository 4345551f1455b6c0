package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hybrid retrieval — Reciprocal Rank Fusion (Cormack, Clarke &
  * Büttcher, SIGIR 2009) of heterogeneous ranked lists, the standard
  * way a RAG stack combines lexical (BM25) and dense (embedding
  * cosine) retrieval without score calibration: only RANKS cross the
  * fusion boundary, so the lists' score scales never have to agree.
  *
  *   rrf(d) = Σ_lists 1/(c + rank_list(d)),  c = 60 per the paper.
  *
  * Engine-exact: each contribution is the integer
  * floor(2^20/(c+rank)) — ranks are small integers, so the fused
  * score is an exact fixed-point long and the sum is order-free (the
  * same convention as BM25's integer sum; no float fusion).
  *
  * 100 TB shape: the inputs are already top-k lists (k rows per query
  * each — tiny by contract, whatever corpus they came from); fusion
  * is a union + one map-side-combinable integer-sum aggregation +
  * the bounded-heap per-query cut. The heavy lifting stays in the
  * upstream retrievers ([[Bm25.topK]], [[Similarity.bruteForceTopK]]
  * or any ANN path — the fusion is retriever-agnostic).
  */
object Hybrid {

  val RrfC = 60L
  val FracBits: Int = 20

  /** Fuse ranked lists — each (qid, doc, rk) with rk 1-based — into
    * (qid, doc, rrf_fp, rk) by descending fused score, doc tie-break.
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int): DataFrame = {
    require(lists.nonEmpty, "at least one ranked list required")
    require(k > 0, "k must be positive")
    val contrib = lists.map(_.select(col("qid"), col("doc"),
      expr(s"${1L << FracBits} div ($RrfC + rk)").as("c_fp")))
    contrib.reduce(_ unionByName _)
      .groupBy(col("qid"), col("doc"))
      .agg(sum(col("c_fp")).as("rrf_fp"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKByScore.topKBy(
        col("rrf_fp").cast(DoubleType), col("doc"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(col("qid"), col("hit.id").as("doc"),
        col("hit.score").cast(LongType).as("rrf_fp"),
        (col("pos") + 1).cast(IntegerType).as("rk"))
  }

  /** Convenience lexical+dense hybrid: BM25 over `docs` text and
    * brute-force cosine over `embeddings` (swap any ANN list in via
    * [[rrfFuse]] directly), each cut at `kCand`, fused to top-k.
    * `queryVecs` must carry (qid, vec) aligned with `queries` qids.
    */
  def hybridTopK(spark: SparkSession, docs: DataFrame, textCol: String,
                 idCol: String, embeddings: DataFrame, vecIdCol: String,
                 vecCol: String, queries: Seq[(Long, String)],
                 queryVecs: DataFrame, kCand: Int, k: Int): DataFrame = {
    val lexical = Bm25.topK(spark, docs, textCol, idCol, queries, kCand)
      .select(col("qid"), col("doc"), col("rk"))
    val dense = Similarity.bruteForceTopK(
        embeddings.select(col(vecIdCol).as("id"), col(vecCol).as("v")),
        queryVecs.select(col("qid").as("id"), col("vec").as("v")),
        "v", "id", kCand, excludeSelf = false)
      .select(col("qid"), col("nid").as("doc"), col("rk"))
    rrfFuse(Seq(lexical, dense), k)
  }
}
