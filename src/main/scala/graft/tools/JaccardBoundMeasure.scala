package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quantifies the AllPairs length bound added to
  * [[graft.pipeline.Dedup.jaccardPairs]] (r8): collision-join output
  * rows and wall time with vs without the size-compatibility
  * predicate, at the shipped query's parameters (w=3, t=0.2,
  * maxShingleDf=128). Run:
  * `sbt "runMain graft.tools.JaccardBoundMeasure [sfDir]"`.
  */
object JaccardBoundMeasure {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    docs.count()
    val (w, t, maxDf) = (3, 0.2, 128)
    val sets = docs.select(col("doc_id").as("doc"),
        array_distinct(graft.pipeline.TextAnalysis.shingleHashes(col("text"), w)).as("shs"))
      .localCheckpoint(true)
    val ex0 = sets.select(col("doc"), size(col("shs")).as("n"),
      explode(col("shs")).as("h"))
    val hot = ex0.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf).select(col("h"))
    val ex = ex0.join(broadcast(hot), Seq("h"), "left_anti").localCheckpoint(true)
    val eps = 1e-9
    def collide(bounded: Boolean) = {
      val base = col("a.h") === col("b.h") && col("a.doc") < col("b.doc")
      val cond = if (!bounded) base else base &&
        col("a.n").cast("double") >= lit(t) * col("b.n") - lit(eps) &&
        col("b.n").cast("double") >= lit(t) * col("a.n") - lit(eps)
      ex.as("a").join(ex.as("b"), cond)
    }
    def pairs(bounded: Boolean) = collide(bounded)
      .groupBy(col("a.doc"), col("b.doc")).agg(count(lit(1)).as("c"))
    for (bounded <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val nColl = collide(bounded).count()
      val nPair = pairs(bounded).count()
      println(f"[bound=$bounded] collision_rows=$nColl pair_rows=$nPair " +
        f"time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // end-to-end shipped operator timing, 3 runs
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.pipeline.Dedup.jaccardPairs(docs, "text", "doc_id", w, t, maxDf).count()
      println(f"[e2e run$i] result_rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
