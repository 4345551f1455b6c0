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

  /** Train a spherical k-means quantizer. Deterministic: seeds picked
    * by hashing ids; iterations are full-scan assign + per-cluster
    * mean, centroids renormalized.
    *
    * The per-cluster mean is a per-partition accumulated vector sum
    * merged with `reduceByKey` (map-side combined): the shuffle per
    * iteration carries at most partitions×nlist records of dim
    * doubles — NOT the earlier posexplode formulation, which
    * multiplied the row count by the vector dimension (N×dim shuffle
    * rows) before aggregating. A quantizer only needs a representative
    * sample, so corpora beyond `maxTrainRows` are seeded-sampled down
    * before iterating; assignment of the full corpus stays in
    * [[assign]].
    */
  def train(df: DataFrame, vecCol: String, idCol: String, nlist: Int,
            iters: Int = 5, seed: Long = 42L,
            maxTrainRows: Long = 200000L): IvfModel = {
    val spark = df.sparkSession
    import spark.implicits._
    val total = df.count()
    val trainDf =
      if (total <= maxTrainRows) df
      else df.sample(withReplacement = false,
        math.min(1.0, maxTrainRows.toDouble * 1.05 / total), seed)
    var centroids: Array[Array[Float]] = trainDf
      .select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol), lit(seed)))
      .limit(nlist)
      .select(col(vecCol)).as[Array[Float]].collect()

    val vecs = trainDf.select(col(vecCol)).as[Array[Float]]
    for (_ <- 1 to iters) {
      val modelB = spark.sparkContext.broadcast(IvfModel(centroids))
      val sums = vecs.rdd
        .mapPartitions { it =>
          val model = modelB.value
          val acc = scala.collection.mutable.HashMap
            .empty[Int, (Array[Double], Long)]
          it.foreach { v =>
            val c = model.nearest(v, 1)(0)
            val (s, n) = acc.getOrElseUpdate(c, (new Array[Double](v.length), 0L))
            var i = 0
            while (i < v.length) { s(i) += v(i); i += 1 }
            acc(c) = (s, n + 1)
          }
          acc.iterator
        }
        .reduceByKey { (a: (Array[Double], Long), b: (Array[Double], Long)) =>
          val (s1, n1) = a
          val (s2, n2) = b
          var i = 0
          while (i < s1.length) { s1(i) += s2(i); i += 1 }
          (s1, n1 + n2)
        }
        .collectAsMap()
      modelB.destroy()
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        sums.get(c) match {
          case None => old // empty cluster keeps its centroid
          case Some((s, cnt)) =>
            val v = s.map(_ / cnt)
            val n = math.sqrt(v.map(x => x * x).sum)
            if (n == 0.0) old else v.map(x => (x / n).toFloat)
        }
      }
    }
    IvfModel(centroids)
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
}
