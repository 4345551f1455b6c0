package graft.pipeline

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — at scale this is
  * broadcast(queries) ⨯ corpus-scan with a per-partition heap
  * (window rank), which parallelizes linearly and never shuffles the
  * corpus vectors. The scale path is LSH bucketing (random
  * hyperplanes): corpus and queries hash to signature buckets, the
  * join becomes an equi-join on (band, key), and only bucket-mates
  * are scored — the standard recall/cost dial at 100 TB (probe more
  * bands for recall).
  */
object Similarity {

  /** Brute-force batched top-k: for each query row, the k nearest
    * corpus rows by cosine. `queries` must be small enough to
    * broadcast (driver batch); output (qid, nid, sim, rk).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
                     idCol: String, k: Int, excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    val joined = c.join(broadcast(q),
      if (excludeSelf) col("nid") =!= col("qid") else lit(true))
    val scored = joined.select(col("qid"), col("nid"),
      cosineSimD(col("nv"), col("qv")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  /** RECOMMEND-style query composition (the Qdrant/Vespa recommend
    * API shape): the query vector is Σ positives − Σ negatives,
    * served like any other query — "more like these, less like
    * those" without a stored query vector. Examples are collected in
    * ASCENDING id order and folded sequentially in doubles, so the
    * derived vector (and therefore every score) replays bit-for-bit
    * in any IEEE engine — the family's determinism rule. The example
    * sets are contract-small (a handful of liked/disliked items);
    * example ids are excluded from the results.
    *
    * Returns (nid, sim, rk) — one composed query. At scale the
    * composition is driver-side O(|examples|·dim); serving cost is
    * whatever path the composed vector is sent down (here: the
    * broadcast brute-force; the composed vector works unchanged as a
    * query to the IVF/quantized tiers).
    */
  def recommendTopK(corpus: DataFrame, vecCol: String, idCol: String,
                    posIds: Seq[Long], negIds: Seq[Long],
                    k: Int): DataFrame = {
    require(posIds.nonEmpty, "at least one positive example required")
    val exIds = (posIds ++ negIds).distinct
    val ex = corpus
      .where(col(idCol).isInCollection(exIds))
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]]("v").toArray).toMap
    exIds.foreach(i => require(ex.contains(i), s"example id $i not found"))
    val dim = ex(posIds.head).length
    val q = new Array[Double](dim)
    posIds.distinct.sorted.foreach { i =>
      val v = ex(i); var j = 0
      while (j < dim) { q(j) += v(j).toDouble; j += 1 }
    }
    negIds.distinct.sorted.foreach { i =>
      val v = ex(i); var j = 0
      while (j < dim) { q(j) -= v(j).toDouble; j += 1 }
    }
    val qCol = typedLit(q.toSeq)
    val scored = corpus
      .where(!col(idCol).isInCollection(exIds))
      .select(col(idCol).as("nid"),
        cosineSimD(col(vecCol), qCol).as("sim"))
    val w = Window.orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  /** MMR-diversified top-k retrieval (Carbonell & Goldstein, SIGIR
    * 1998): greedy selection maximizing
    * `λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s)` — relevance
    * traded against redundancy, the standard fix when plain top-k
    * returns k near-copies of the same document.
    *
    * Scale shape: candidate generation is the DISTRIBUTED stage (the
    * broadcast-queries brute-force top-N here; swap in any ANN path
    * for bigger corpora) and the greedy rerank is a BOUNDED driver
    * fold over queries × candidates rows (the selection is inherently
    * sequential — each pick depends on all previous picks — so
    * distributing it buys nothing and costs a shuffle per pick).
    * Deterministic: candidates ordered by (sim desc, nid), scores are
    * sequential IEEE-double folds in that order, ties keep the first
    * (highest-relevance) candidate — the Python golden replays the
    * identical arithmetic.
    *
    * Output: (qid, nid, sim, rk) with rk = 1-based SELECTION order
    * (the diversified ranking, not the cosine ranking).
    */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, k: Int, lambda: Double = 0.7,
              candidates: Int = 0, excludeSelf: Boolean = true): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0, 1]")
    val spark = corpus.sparkSession
    import spark.implicits._
    val nCand = if (candidates > 0) candidates else 4 * k
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"))
    val joined = c.join(broadcast(q),
      if (excludeSelf) col("nid") =!= col("qid") else lit(true))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    // vectors ride along so the rerank needs no second corpus pass;
    // the collect is contract-bounded: queries × nCand rows
    val cands = joined.select(col("qid"), col("nid"),
        cosineSimD(col("nv"), col("qv")).as("sim"), col("nv"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= nCand)
      .select(col("qid"), col("nid"), col("sim"), col("nv"))
      .as[(Long, Long, Double, Array[Float])].collect()
    val out = cands.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (qid, arr) =>
        val sorted = arr.sortBy(t => (-t._3, t._2))
        val picked = scala.collection.mutable.ArrayBuffer.empty[Int]
        val open = scala.collection.mutable.ArrayBuffer.range(0, sorted.length)
        while (picked.length < math.min(k, sorted.length)) {
          var bestAt = -1
          var bestScore = Double.NegativeInfinity
          var j = 0
          while (j < open.length) {
            val i = open(j)
            // true max over selected (cosines can be negative); 0.0
            // only for the empty set (first pick = pure relevance)
            var red = if (picked.isEmpty) 0.0 else Double.NegativeInfinity
            picked.foreach { p =>
              val s = cosD(sorted(i)._4, sorted(p)._4)
              if (s > red) red = s
            }
            val score = lambda * sorted(i)._3 - (1.0 - lambda) * red
            if (score > bestScore) { bestScore = score; bestAt = j }
            j += 1
          }
          picked += open.remove(bestAt)
        }
        picked.zipWithIndex.map { case (i, r) =>
          (qid, sorted(i)._2, sorted(i)._3, (r + 1).toLong)
        }
    }
    spark.createDataset(out).toDF("qid", "nid", "sim", "rk")
  }

  /** The CosineSimD kernel over driver-side float arrays — the SAME
    * sequential fold (element-order adds, one division) so the rerank
    * agrees bit-for-bit with the distributed stage and the golden.
    */
  private def cosD(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var d = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; nx += x * x; ny += y * y
      i += 1
    }
    d / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** Signed random hyperplane signature; bit i = sign(dot(v, plane_i)).
    * Coefficients are exact splitmix64 dyadic rationals
    * ([[graft.functions.HyperplaneKeys.planes]]) — engine-replayable,
    * no RNG stream or libm; coordinate-wise uniform rather than
    * Gaussian (sign-LSH only needs a symmetric distribution; the
    * recall floor is asserted against brute force in AnnSpec).
    * Backed by the codegen'd [[graft.functions.HyperplaneKeys]]
    * expression (no per-row UDF converter).
    */
  def hyperplaneSig(v: org.apache.spark.sql.Column, dim: Int, bits: Int,
                    seed: Long = 42L): org.apache.spark.sql.Column =
    graft.functions.ColumnBridge.column(
      graft.functions.HyperplaneKeys(
        graft.functions.ColumnBridge.expression(v), dim, 0, bits, seed))
      .getItem(0)

  /** Per-band keys from the hyperplane signature in one expression —
    * a sig column + per-band shift expressions gets the signature
    * inlined (and re-executed) per band by CollapseProject.
    */
  private def hyperplaneBandKeys(v: org.apache.spark.sql.Column, dim: Int,
                                 bands: Int, bitsPerBand: Int,
                                 seed: Long): org.apache.spark.sql.Column =
    graft.functions.ColumnBridge.column(
      graft.functions.HyperplaneKeys(
        graft.functions.ColumnBridge.expression(v), dim, bands,
        bitsPerBand, seed))

  // ------------------------------------------------ int8 quantization --
  /** Per-vector symmetric int8 quantization — the standard 4× storage /
    * bandwidth cut for billion-scale vector search: `scale =
    * max|v|/127`, `code_i = floor(v_i/scale + 0.5)` (explicit
    * floor(+0.5) so every engine rounds identically; all-zero vectors
    * quantize to zero codes). One pass per row, emitted as compact
    * BinaryType.
    *
    * Cosine needs no dequantization: the per-vector scales cancel, so
    * cosine(dequant(a), dequant(b)) == cosine(codes_a, codes_b) — and
    * the integer dot products are EXACT (≤ dim·127² ≪ 2^53), which
    * makes the whole scorer bit-reproducible across engines, unlike
    * float-accumulation-order-sensitive exact cosine.
    */
  def int8Codes(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.VectorFunctions.int8Codes(v)

  /** Top-k by cosine over int8 codes: quantize corpus and queries once,
    * broadcast the quantized queries, score with the codegen'd
    * [[graft.functions.Int8CosineSim]] integer kernel (one pass, LONG
    * accumulators, zero-norm rows score 0). Same plan shape as
    * [[bruteForceTopK]] — corpus never shuffles — at a quarter of the
    * scan/broadcast bytes.
    */
  def int8TopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
               idCol: String, k: Int, excludeSelf: Boolean = true): DataFrame = {
    def quant(df: DataFrame, id: String, pre: String) =
      df.select(col(id).as(s"${pre}id"),
        int8Codes(col(vecCol)).as(s"${pre}c"))
    val c = quant(corpus, idCol, "n")
    val q = quant(queries, idCol, "q")
    val joined = c.join(broadcast(q),
      if (excludeSelf) col("nid") =!= col("qid") else lit(true))
    val scored = joined.select(col("qid"), col("nid"),
      graft.functions.VectorFunctions.int8CosineSim(col("nc"), col("qc"))
        .as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  /** Two-stage PCA ANN: candidates ranked by cosine in PCA-reduced
    * space (k·`oversample` per query), then exact full-dimension
    * rescore and final top-k — the classic dimensionality-reduction
    * retrieval shape: the CANDIDATE scan reads reduced vectors (model
    * dim / input dim of the bytes; at scale the reduced column is the
    * stored index and the full vectors are back-joined only for the
    * oversampled candidates), recall governed by how much variance the
    * basis captures × the oversample dial. Everything is exact-replay
    * arithmetic (PCA projection + sequential-double cosine), so the
    * whole two-stage pipeline is oracle-checkable.
    */
  def pcaTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, k: Int, model: Pca.PcaModel,
              oversample: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nv"),
      Pca.project(col(vecCol), model).as("nr"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      Pca.project(col(vecCol), model).as("qr"))
    val stage1 = c.join(broadcast(q), col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), col("nv"), col("qv"),
        cosineSimD(col("nr"), col("qr")).as("simr"))
    val w1 = Window.partitionBy(col("qid")).orderBy(col("simr").desc, col("nid").asc)
    val cand = stage1.withColumn("rk1", row_number().over(w1))
      .where(col("rk1") <= k * oversample)
    val w2 = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    cand.select(col("qid"), col("nid"),
        cosineSimD(col("nv"), col("qv")).as("sim"))
      .withColumn("rk", row_number().over(w2)).where(col("rk") <= k)
  }

  /** LSH-bucketed ANN: candidates share at least one b-bit band of the
    * hyperplane signature (equi-join on (band, key)); candidates are
    * re-scored exactly and ranked per query. Approximate: recall
    * depends on bands×bits; verify against [[bruteForceTopK]].
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, k: Int, dim: Int, bands: Int = 16,
              bitsPerBand: Int = 4, seed: Long = 42L): DataFrame = {
    val bits = bands * bitsPerBand
    require(bits <= 64, "signature must fit in 64 bits")
    def banded(df: DataFrame, id: String, vec: String) =
      df.select(col(id), col(vec),
          posexplode(hyperplaneBandKeys(col(vec), dim, bands, bitsPerBand, seed)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    val c = banded(corpus.select(col(idCol).as("nid"), col(vecCol).as("nv")), "nid", "nv")
    val q = banded(queries.select(col(idCol).as("qid"), col(vecCol).as("qv")), "qid", "qv")
    val cand = c.join(broadcast(q), Seq("band", "key"))
      .where(col("nid") =!= col("qid"))
      .dropDuplicates("qid", "nid")
    val scored = cand.select(col("qid"), col("nid"),
      cosineSimD(col("nv"), col("qv")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  /** Recall@k of an approximate neighbor list against the exact one —
    * the evaluation harness every ANN deployment runs before trusting
    * an index: per query, the fraction of the true top-k
    * ([[bruteForceTopK]]'s output, the ground truth) that the
    * approximate method ([[lshTopK]], [[Ivf.search]], …) returned.
    * Both inputs are (qid, nid[, …]) top-k lists — queries × k rows —
    * so the cost is independent of corpus size; every exact qid
    * appears in the output (0 hits ⇒ recall 0.0), and extra columns
    * on either side are ignored.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    // dedupe defensively: a repeated (qid, nid) row on the approx side
    // (a top-k contract violation) would double-count through the join
    // and push recall past 1.0 — silently
    val ap = approx.select(col("qid"), col("nid")).dropDuplicates("qid", "nid")
      .withColumn("hit", lit(1L))
    // the approx side is queries × k rows by contract — broadcast it
    // rather than letting the estimator pick a sort-merge join off
    // the (large) upstream plan's size guess
    exact.select(col("qid"), col("nid"))
      .join(broadcast(ap), Seq("qid", "nid"), "left")
      .groupBy(col("qid"))
      .agg(coalesce(sum(col("hit")), lit(0L)).as("hits"),
        count(lit(1)).as("n_exact"))
      // denominate by what the exact list actually holds (≤ k): a
      // query whose true neighborhood has fewer than k members can
      // still reach recall 1.0
      .withColumn("recall",
        col("hits").cast(org.apache.spark.sql.types.DoubleType) /
          least(lit(k.toLong), col("n_exact"))
            .cast(org.apache.spark.sql.types.DoubleType))
      .drop("n_exact")
  }
}
