package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** EXACT range (radius) search over the cluster-partitioned [[Ivf]]
  * layout — "every neighbor with cosine ≥ τ", the vector-db
  * complement to top-k (Qdrant/Milvus range queries, DBSCAN's ε-ball
  * primitive, near-dup mining at a recall-1.0 contract).
  *
  * Unlike the probed top-k tier this path is NEVER approximate: each
  * cluster carries a persisted RADIUS sidecar r_c = max ‖x̂ − ĉ‖ over
  * its members (unit-normalized copies; cosine = 1 − ‖x̂ − q̂‖²/2),
  * and the triangle inequality gives a SOUND prune — a cluster can
  * be skipped iff ‖q̂ − ĉ‖ > d_max + r_c with d_max = √(2 − 2τ), in
  * which case NO member can reach τ. What survives the bound is
  * scanned and scored exactly, so the result equals brute force over
  * the corpus by construction (oracle-pinned), while clustered
  * corpora read only the admissible cells. On a corpus with no
  * cluster structure (this fixture: near-uniform on the sphere,
  * radii ≈ the sphere diameter) the bound admits everything and the
  * search degrades to an exact exhaustive scan — correct, just
  * unpruned; the spec pins the pruning on a clustered fixture.
  *
  * The radius sidecar is ADDITIVE like the BM25 stats rows: build
  * and each append contribute (cluster, r) rows, readers take the
  * per-cluster MAX — so incremental appends never rewrite it, and a
  * missing sidecar (pre-existing layouts) reads as r = 2 (the sphere
  * diameter: admits every cluster, never unsound).
  *
  * 100 TB: the sidecar is nlist rows; admissibility is one
  * |queries| × nlist broadcast cross (both small by the family's
  * query contract and the semDedup nlist rule), the probe reads only
  * admissible cluster dirs (PartitionIn pushdown, count-gated at
  * nlist), and scoring is the codegen'd exact kernel.
  */
object RangeSearch {

  /** Slack added to the admissibility bound so float rounding in the
    * persisted radii / centroid dots can never turn the sound prune
    * unsound at the τ boundary.
    */
  private val BoundSlack = 1e-6

  private def radiiPath(indexPath: String): String = s"$indexPath/_radii"

  /** (cluster, cvec) frame of the model's flat centroids. */
  private def centroidFrame(spark: SparkSession,
                            model: IvfModel): DataFrame = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq.toDF("cluster", "cvec")
  }

  /** ‖x̂ − ĉ‖ from the exact cosine kernel (unit-normalized copies):
    * √(2 − 2·cos), clamped at 0 against rounding.
    */
  private def nDist(x: org.apache.spark.sql.Column,
                    c: org.apache.spark.sql.Column) = {
    import graft.functions.VectorFunctions.cosineSimD
    sqrt(greatest(lit(2.0) - lit(2.0) * cosineSimD(x, c), lit(0.0)))
  }

  /** Append the radius contribution of `postings` (an assigned
    * (cluster, vec) frame: the build corpus or an append increment)
    * to the layout's `_radii` sidecar. Additive: readers max over
    * rows, so increments stack without rewrites.
    */
  def appendRadii(spark: SparkSession, postings: DataFrame, vecCol: String,
                  model: IvfModel, indexPath: String): Unit = {
    if (postings.isEmpty) return
    postings
      .join(broadcast(centroidFrame(spark, model)), Seq("cluster"))
      .groupBy(col("cluster"))
      .agg(max(nDist(col(vecCol), col("cvec"))).as("r"))
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(radiiPath(indexPath))
  }

  /** Compute the sidecar for an EXISTING layout in one pass (the
    * retrofit entry point; new builds call [[appendRadii]] with the
    * frame they just wrote).
    */
  def writeRadii(spark: SparkSession, indexPath: String, vecCol: String,
                 model: IvfModel): Unit =
    appendRadii(spark, Ivf.readIndex(spark, indexPath), vecCol, model,
      indexPath)

  /** All (qid, nid, sim ≥ tau) pairs, exactly — cell-pruned by the
    * radius bound where the corpus allows it. `queries` is a small
    * (idCol, vecCol) frame per the family's query contract;
    * `excludeSelf` drops qid = nid hits.
    *
    * `docFilter` is filter-inside-search over the postings columns
    * (the family's Lucene filter contract), applied below the radius
    * cut: the result is exactly brute force over the FILTERED corpus
    * (a radius query has no k to under-fill, so no widening loop is
    * needed — contrast the probed top-k tier). Sound under the
    * triangle-inequality prune unchanged: the per-cluster radii
    * bound the FULL membership, filtering only removes candidates
    * from admitted cells, never adds any — the bound over-admits,
    * which is the safe direction.
    *
    * Soundness contract: every append to the layout must be
    * accompanied by its [[appendRadii]] increment — an unrecorded
    * increment can push a member past its cluster's recorded radius
    * and prune a qualifying cell (deletes are safe: a too-large
    * radius only admits more). [[Ivf.recluster]] retires the sidecar
    * with its swap (cluster ids re-key), falling back to admit-all.
    */
  def search(spark: SparkSession, indexPath: String, queries: DataFrame,
             vecCol: String, idCol: String, model: IvfModel, tau: Double,
             excludeSelf: Boolean = true,
             docFilter: Option[org.apache.spark.sql.Column] =
               None): DataFrame = {
    import graft.functions.VectorFunctions.cosineSimD
    // the SERVING read: tombstoned vectors must not resurface in
    // range results between folds (the family's masked-read rule;
    // also runs the DirSwap recovery preamble). Their mass in the
    // radius sidecar only over-estimates — sound.
    val idx0 = Ivf.readIndexServing(spark, indexPath, idCol)
      .where(docFilter.getOrElse(lit(true)))
    // per-cluster radii: max over the additive sidecar rows; clusters
    // without a row (or no sidecar at all) read as the sphere
    // diameter — admit, never unsoundly prune
    val rp = new org.apache.hadoop.fs.Path(radiiPath(indexPath))
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val radii =
      if (!fs.exists(rp)) spark.range(0).select(
        col("id").cast("int").as("cluster"), lit(2.0).as("r"))
      else spark.read.parquet(radiiPath(indexPath))
        .groupBy(col("cluster")).agg(max(col("r")).as("r"))
    val cents = centroidFrame(spark, model)
      .join(radii, Seq("cluster"), "left")
      .withColumn("r", coalesce(col("r"), lit(2.0)))
    val dMax = math.sqrt(math.max(2.0 - 2.0 * tau, 0.0))
    // admissibility: |queries| × nlist broadcast cross, bound-filtered
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"))
    val probe = q.crossJoin(broadcast(cents))
      .where(nDist(col("qv"), col("cvec")) <=
        lit(dMax + BoundSlack) + col("r"))
      .select(col("qid"), col("qv"), col("cluster"))
    // count-gated In pushdown: admissible cluster ids are ≤ nlist by
    // construction — driver-boundable, the family's partition prune
    val cids = probe.select(col("cluster")).distinct()
      .collect().map(_.getInt(0).toLong).toSeq
    if (cids.isEmpty)
      return q.select(col("qid"), col("qid").as("nid"),
        lit(0.0).as("sim")).limit(0)
    idx0
      .where(graft.core.PartitionIn.inSet(idx0, "cluster", cids))
      .select(col("cluster"), col(idCol).as("nid"), col(vecCol).as("nv"))
      .join(broadcast(probe), Seq("cluster"))
      .where(if (excludeSelf) col("nid") =!= col("qid") else lit(true))
      .select(col("qid"), col("nid"),
        cosineSimD(col("nv"), col("qv")).as("sim"))
      .where(col("sim") >= tau)
  }
}
