package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures WHAT [[graft.pipeline.Ivf.recluster]] buys under
  * distribution drift: build an index under a quantizer trained
  * before the drift, append a drifted increment (the original
  * embeddings pulled toward one cap of the sphere — the "new data
  * source" shape), and compare the stale-model index against the
  * reclustered one on (a) cluster-list balance — hot lists are the
  * probe-cost killer at scale — and (b) recall@5 at fixed nprobe for
  * drifted queries. Run:
  * `sbt "runMain graft.tools.ReclusterMeasure [sfDir]"`.
  */
object ReclusterMeasure {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.Ivf

    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    // drifted increment: pull every vector toward a fixed direction
    // (first basis axis) and renormalize — concentrates the new data
    // in one spherical cap, the classic new-source drift
    val drifted = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, x + lit(2.0f)).otherwise(x)).as("raw"))
      .select(col("vec_id"),
        graft.functions.VectorFunctions.l2NormalizeF(col("raw")).as("embedding"))
      .localCheckpoint(true)

    val nlist = 64
    val stale = Ivf.train(emb, "embedding", "vec_id", nlist = nlist, iters = 5)
    val idx = java.nio.file.Files.createTempDirectory("recl_m")
      .resolve("index").toString
    Ivf.writeIndex(Ivf.assign(emb, "embedding", stale), idx)
    Ivf.appendToIndex(drifted, "embedding", stale, idx)

    def balance(tag: String): Unit = {
      val sizes = spark.read.parquet(idx).groupBy("cluster").count()
        .agg(max("count"), avg("count"), count(lit(1))).head()
      println(f"[recl] $tag%-12s lists=${sizes.getLong(2)}%3d " +
        f"max=${sizes.getLong(0)}%6d mean=${sizes.getDouble(1)}%8.1f " +
        f"imbalance=${sizes.getLong(0) / sizes.getDouble(1)}%5.2f")
    }
    val qs = drifted.where(col("vec_id") < 1000100L) // 100 drifted queries
    // recall AND the work it cost: mean postings scanned per query =
    // the probed clusters' list sizes summed — the number a fixed
    // nprobe is supposed to bound, and what a hot list silently blows
    def measure(tag: String, model: graft.pipeline.IvfModel,
                nprobe: Int): Unit = {
      val corpus = spark.read.parquet(idx)
      val truth = graft.pipeline.Similarity.bruteForceTopK(
        corpus.select(col("vec_id").as("id"), col("embedding").as("v")),
        qs.select(col("vec_id").as("id"), col("embedding").as("v")),
        "v", "id", 5)
      val approx = Ivf.search(corpus, qs, "embedding", "vec_id", model,
        k = 5, nprobe = nprobe).select(col("qid"), col("nid"))
      val r = graft.pipeline.Similarity.recallAtK(truth, approx, 5)
        .agg(avg("recall")).head().getDouble(0)
      val sizes = corpus.groupBy("cluster").count()
      val probed = qs.select(col("vec_id").as("qid"),
          explode(graft.functions.ColumnBridge.column(
            graft.pipeline.IvfNearest(graft.functions.ColumnBridge
              .expression(col("embedding")), model, nprobe))).as("cluster"))
        .join(sizes, Seq("cluster"))
        .groupBy("qid").agg(sum("count").as("scanned"))
        .agg(avg("scanned")).head().getDouble(0)
      println(f"[recl] $tag%-12s nprobe=$nprobe%2d recall@5=$r%.3f " +
        f"scanned/query=$probed%7.1f (${100.0 * probed / (2 * n)}%4.1f%% of corpus)")
    }

    balance("stale")
    measure("stale", stale, 4)
    val t0 = System.nanoTime()
    val fresh = Ivf.recluster(spark, idx, "embedding", "vec_id",
      nlist = nlist, iters = 5)
    println(f"[recl] recluster    ${(System.nanoTime() - t0) / 1e9}%.2f s over ${2 * n} rows")
    balance("reclustered")
    // same nominal nprobe, then the sweep that finds EQUAL-WORK recall
    Seq(4, 8, 16, 24).foreach(p => measure("reclustered", fresh, p))
    spark.stop()
  }
}
