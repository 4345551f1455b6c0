package graft.tools

import graft.pipeline.NearDupIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the neardup_index_incremental lifecycle —
  * which of build / probe+append / compact / probe carries the cost.
  */
object ProfileNearDup {
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
    docs.count() // warm
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val path = java.nio.file.Files.createTempDirectory("ndi_prof")
        .resolve("index").toString
      val a = docs.where(col("doc_id") % 3 === 0)
      val b = docs.where(col("doc_id") % 3 === 1)
      val c = docs.where(col("doc_id") % 3 === 2)
      t("buildWithPairs(A)") {
        NearDupIndex.buildWithPairs(spark, a, "text", "doc_id", path,
          threshold = 0.2).count()
      }
      t("probeAndAppend(B)") {
        NearDupIndex.probeAndAppend(spark, path, b, "text", "doc_id",
          threshold = 0.2).count()
      }
      t("compactIndex") { NearDupIndex.compactIndex(spark, path) }
      t("probe(C)") {
        NearDupIndex.probe(spark, path, c, "text", "doc_id",
          threshold = 0.2).count()
      }
    }
    spark.stop()
  }
}
