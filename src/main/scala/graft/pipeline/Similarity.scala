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
}
