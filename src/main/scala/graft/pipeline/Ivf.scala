package graft.pipeline

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN: a spherical k-means coarse quantizer
  * built with DataFrame ops, then search = probe the `nprobe` nearest
  * centroid lists and rescore exactly.
  *
  * This is the batch-index-build path the north star asks for: train
  * and assignment are full scans (one shuffle per iteration, keyed by
  * cluster id — nlist×dim floats to the driver, never vectors), and a
  * search touches ~nprobe/nlist of the corpus via a cluster-id
  * equi-join on the pre-partitioned postings. At 100 TB the postings
  * table is written back partitioned by `cluster` so probes prune
  * partitions at the parquet level. Online serving stays out of scope
  * (BASELINE.json); this is offline index build + batch query.
  */
object Ivf {

  final case class IvfModel(centroids: Array[Array[Float]]) extends Serializable {
    def nlist: Int = centroids.length

    /** ids of the `n` centroids nearest to `v` by dot product. */
    def nearest(v: Array[Float], n: Int): Array[Int] =
      centroids.indices
        .map(c => (c, dot(centroids(c), v)))
        .sortBy { case (c, s) => (-s, c) }
        .take(n).map(_._1).toArray

    private def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
  }

  /** splitmix64 finalizer — seeds the deterministic centroid init. */
  @inline private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Train a spherical k-means quantizer on a BOUNDED sample, folded
    * sequentially on the driver — the faiss design: a coarse quantizer
    * only needs a representative sample (`maxTrainRows`, ≈50 MB of
    * float32 at 200k×64), so training costs ONE bounded collect and
    * zero per-iteration distributed passes; the full-corpus work is
    * all in [[assign]]/[[search]], which scan once. (The previous
    * formulation ran a mapPartitions vector-sum + reduceByKey per
    * iteration — already shuffle-frugal, but its merge order made the
    * low bits of the centroids partition-nondeterministic, which can
    * flip boundary assignments and makes the model un-oracle-able.)
    *
    * Fully deterministic: the sample is collected sorted by id,
    * centroids init from a splitmix64 pseudo-shuffle of the ids, and
    * accumulation is sequential in id order — bit-reproducible across
    * runs, partitionings, and engines (the Python oracle replays the
    * identical fold).
    */
  def train(df: DataFrame, vecCol: String, idCol: String, nlist: Int,
            iters: Int = 5, seed: Long = 42L,
            maxTrainRows: Long = 200000L): IvfModel =
    IvfModel(kmeansFold(collectSample(df, vecCol, idCol, seed, maxTrainRows),
      nlist, iters, seed))

  /** Two-level (hierarchical) train for LARGE nlist: an L1 quantizer
    * with ~√nlist centroids partitions the sample, then each L1 cell
    * trains its own nlist/√nlist sub-centroids — the flat model the
    * search path consumes is their concatenation. Driver cost drops
    * from sample×nlist to sample×2√nlist distance evaluations (the
    * faiss IVF_HNSW/two-level recipe): at nlist = 65536 that is ~128×
    * less fold work, which is what makes corpus-proportional nlist
    * (the [[graft.pipeline.Dedup.semDedup]] contract) affordable past
    * a few thousand clusters. Deterministic by the same construction
    * as [[train]] — the Python oracle replays L1, the per-cell L2
    * folds in cell order, and the concatenation order.
    */
  def trainHierarchical(df: DataFrame, vecCol: String, idCol: String,
                        nlist: Int, iters: Int = 5, seed: Long = 42L,
                        maxTrainRows: Long = 200000L,
                        branch: Int = 0): IvfModel = {
    val sample = collectSample(df, vecCol, idCol, seed, maxTrainRows)
    val b1 = if (branch > 0) branch
      else math.max(1, math.round(math.sqrt(nlist.toDouble)).toInt)
    val l1 = IvfModel(kmeansFold(sample, b1, iters, seed))
    // ceil: b1·kc must be ≥ nlist or a non-square nlist silently
    // yields fewer clusters than the caller sized for (n²/nlist work
    // contract); cells with few members under-fill, so the final
    // count lands in [b1, b1·kc]
    val kc = math.max(1, (nlist + b1 - 1) / b1)
    val groups = Array.fill(l1.nlist)(
      scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])])
    sample.foreach { case (id, v) => groups(l1.nearest(v, 1)(0)) += ((id, v)) }
    val cents = groups.zipWithIndex.flatMap { case (g, c) =>
      if (g.isEmpty) Array(l1.centroids(c)) // empty cell keeps its L1 centroid
      else kmeansFold(g.toArray, kc, iters, seed)
    }
    IvfModel(cents)
  }

  private def collectSample(df: DataFrame, vecCol: String, idCol: String,
                            seed: Long,
                            maxTrainRows: Long): Array[(Long, Array[Float])] = {
    val spark = df.sparkSession
    import spark.implicits._
    val total = df.count()
    val trainDf =
      if (total <= maxTrainRows) df
      else df.sample(withReplacement = false,
        math.min(1.0, maxTrainRows.toDouble * 1.05 / total), seed)
    val sample: Array[(Long, Array[Float])] = trainDf
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    require(sample.nonEmpty, "cannot train on an empty corpus")
    sample
  }

  /** The sequential k-means fold shared by [[train]] and
    * [[trainHierarchical]]: splitmix64 pseudo-shuffle init, then
    * `iters` sequential-in-id-order accumulation passes.
    */
  private def kmeansFold(sample: Array[(Long, Array[Float])], nlist: Int,
                         iters: Int, seed: Long): Array[Array[Float]] = {
    var centroids: Array[Array[Float]] = sample
      .map { case (id, v) => (splitmix64(id + seed), id, v) }
      .sortBy { case (h, id, _) => (h, id) }
      .take(nlist).map(_._3)

    for (_ <- 1 to iters) {
      val model = IvfModel(centroids)
      val dim = centroids.head.length
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { case (_, v) =>
        val c = model.nearest(v, 1)(0)
        var i = 0
        val n = math.min(dim, v.length)
        while (i < n) { sums(c)(i) += v(i); i += 1 }
        counts(c) += 1
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old // empty cluster keeps its centroid
        else {
          val v = sums(c).map(_ / counts(c))
          val n = math.sqrt(v.map(x => x * x).sum)
          if (n == 0.0) old else v.map(x => (x / n).toFloat)
        }
      }
    }
    centroids
  }

  private def mkAssignUdf(model: IvfModel, nprobe: Int) =
    udf((v: Array[Float]) => model.nearest(v, nprobe))

  /** Postings table: corpus rows + their cluster id. Persist this
    * partitioned by `cluster` for partition-pruned probes at scale.
    */
  def assign(df: DataFrame, vecCol: String, model: IvfModel): DataFrame =
    df.withColumn("cluster", mkAssignUdf(model, 1)(col(vecCol)).getItem(0))

  /** Persist the postings partitioned by cluster id — probes then
    * prune at the directory level (`PartitionFilters` in the scan), so
    * a search touches ~nprobe/nlist of the files. This is the on-disk
    * index layout for the 100 TB batch-serving path.
    */
  def writeIndex(postings: DataFrame, path: String): Unit =
    postings.write.mode("overwrite").partitionBy("cluster").parquet(path)

  def readIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Quantized on-disk index: the vector column is replaced by its
    * int8 codes (BinaryType), quartering index bytes — the layout
    * [[searchInt8]] serves from at scale (same cluster partitioning,
    * same PartitionFilters pruning).
    */
  def writeIndexInt8(postings: DataFrame, vecCol: String, path: String): Unit =
    postings
      .withColumn("codes", Similarity.int8Codes(col(vecCol)))
      .drop(vecCol)
      .write.mode("overwrite").partitionBy("cluster").parquet(path)

  /** Batched ANN search: probe the nprobe nearest lists per query via
    * a cluster equi-join, rescore exactly, rank per query.
    */
  def search(postings: DataFrame, queries: DataFrame, vecCol: String,
             idCol: String, model: IvfModel, k: Int,
             nprobe: Int = 4): DataFrame = {
    val probeUdf = mkAssignUdf(model, nprobe)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
      .withColumn("cluster", explode(probeUdf(col("qv"))))
    val c = postings.select(col("cluster"), col(idCol).as("nid"), col(vecCol).as("nv"))
    val cand = c.join(broadcast(q), Seq("cluster"))
      .where(col("nid") =!= col("qid"))
      .dropDuplicates("qid", "nid")
    val scored = cand.select(col("qid"), col("nid"),
      cosineSimD(col("nv"), col("qv")).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }

  /** Quantized IVF search — the billion-scale composition: cluster
    * pruning bounds WHICH postings are touched, int8 codes bound the
    * BYTES per touched posting (4× under float32; at scale the index
    * stores codes, derived here from the vector column), and the
    * scorer is the codegen'd exact-integer [[graft.functions.Int8CosineSim]]
    * kernel. Probe/rank plan identical to [[search]].
    */
  def searchInt8(postings: DataFrame, queries: DataFrame, vecCol: String,
                 idCol: String, model: IvfModel, k: Int,
                 nprobe: Int = 4): DataFrame =
    searchCodes(
      postings.select(col("cluster"), col(idCol),
        Similarity.int8Codes(col(vecCol)).as("codes")),
      queries, vecCol, idCol, model, k, nprobe)

  /** Serve directly from a quantized index ([[writeIndexInt8]] layout:
    * cluster, id, codes) — queries quantize on the fly, postings never
    * touch a float vector.
    */
  def searchCodes(index: DataFrame, queries: DataFrame, vecCol: String,
                  idCol: String, model: IvfModel, k: Int,
                  nprobe: Int = 4): DataFrame = {
    val probeUdf = mkAssignUdf(model, nprobe)
    val q = queries.select(col(idCol).as("qid"),
        Similarity.int8Codes(col(vecCol)).as("qc"), col(vecCol).as("qv"))
      .withColumn("cluster", explode(probeUdf(col("qv"))))
      .drop("qv")
    val c = index.select(col("cluster"), col(idCol).as("nid"),
      col("codes").as("nc"))
    val cand = c.join(broadcast(q), Seq("cluster"))
      .where(col("nid") =!= col("qid"))
      .dropDuplicates("qid", "nid")
    val scored = cand.select(col("qid"), col("nid"),
      graft.functions.VectorFunctions.int8CosineSim(col("nc"), col("qc"))
        .as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
  }
}
