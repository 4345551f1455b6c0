package graft.tools

import graft.pipeline.Bm25
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the bm25_topk_incremental lifecycle. */
object ProfileBm25 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val half = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val idx = java.nio.file.Files.createTempDirectory("bm25_prof")
        .resolve("index").toString
      t("writeIndex(half)") {
        Bm25.writeIndex(spark, docs.where(col("doc_id") <= half), "text",
          "doc_id", idx)
      }
      t("appendToIndex(half)") {
        Bm25.appendToIndex(spark, docs.where(col("doc_id") > half), "text",
          "doc_id", idx)
      }
      t("compactIndex") { Bm25.compactIndex(spark, idx) }
      t("searchIndex") {
        Bm25.searchIndex(spark, idx, Seq(0L -> "hash join",
          1L -> "fast table scan", 2L -> "merge sort window"), 10).count()
      }
    }
    spark.stop()
  }
}
