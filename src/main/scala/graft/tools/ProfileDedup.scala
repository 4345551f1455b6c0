package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage timings of the near-dup pipeline (plan-quality review):
  * jaccard pairs, label propagation, final anti-join. Run:
  * `sbt "runMain graft.tools.ProfileDedup [sfDir]"`.
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $n%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    docs.count() // warm the parquet footer/codegen paths
    time("jaccardPairs cold") {
      graft.pipeline.Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.2, 128).count()
    }
    val pairs = time("jaccardPairs warm+pin") {
      graft.pipeline.Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.2, 128)
        .localCheckpoint(true)
    }
    println("[prof] pairs=" + pairs.count())
    val cl = time("nearDupClusters") {
      val c = graft.pipeline.Dedup.nearDupClusters(pairs)
      c.count(); c
    }
    println("[prof] cluster rows=" + cl.count())
    time("dropNearDups anti-join") {
      graft.pipeline.Dedup.dropNearDups(docs, pairs, "doc_id").count()
    }
    spark.stop()
  }
}
