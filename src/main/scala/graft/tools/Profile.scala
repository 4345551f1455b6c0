package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for bench hot spots (not part of the driver
  * contract; run with `runMain graft.tools.Profile <sfDir>`).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.Dedup
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warmup")(spark.range(1000000L).selectExpr("sum(id)").collect())
    val sh = docs.select(col("doc_id").as("doc"),
      array_distinct(graft.functions.HashFunctions
        .shingleHashes(col("text"), 3)).as("shs"))
    time("shingles-only")(sh.select(sum(size(col("shs")))).collect())
    val ex = sh.select(col("doc"), size(col("shs")).as("n"),
        explode(col("shs")).as("h"))
    time("explode+hash")(ex.count())
    val joined = ex.as("a").join(ex.as("b"),
      col("a.h") === col("b.h") && col("a.doc") < col("b.doc"))
    time("self-join")(joined.count())
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.2)
    time("full-jaccard")(pairs.count())
    time("full-jaccard-2nd")(pairs.count())
    pairs.explain("formatted")
    spark.stop()
  }
}
