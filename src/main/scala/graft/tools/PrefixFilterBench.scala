package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures what the AllPairs length filter (Bayardo WWW'07) and the
  * positional filter (Xiao WWW'08, PPJoin) buy on the prefix-filtered
  * exact-Jaccard join: candidate-pair counts at each pruning level and
  * end-to-end time, on the real documents table. Run:
  * `sbt "runMain graft.tools.PrefixFilterBench [sfDir]"`.
  */
object PrefixFilterBench {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val (w, threshold) = (3, 0.2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    docs.count()

    // the prefix frame, built once, exactly as jaccardPairsPrefix does
    val sets = docs.select(col("doc_id").as("doc"),
        array_distinct(graft.pipeline.TextAnalysis
          .shingleHashes(col("text"), w)).as("shs"))
      .where(size(col("shs")) > 0).localCheckpoint(true)
    val posts = sets.select(col("doc"), size(col("shs")).as("n"),
      explode(col("shs")).as("h"))
    val dfreq = posts.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val w1 = Window.partitionBy(col("doc")).orderBy(col("df"), col("h"))
    val prefix = posts.join(dfreq, Seq("h"))
      .withColumn("rk", row_number().over(w1))
      .where(col("rk") <=
        col("n") - ceil(lit(threshold) * col("n")).cast("long") + 1L)
      .select(col("h"), col("doc"), col("n"), col("rk"))
      .localCheckpoint(true)
    val eps = 1e-9

    val prefixOnly = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.doc") < col("b.doc"))
      .select(col("a.doc"), col("b.doc")).distinct().count()
    val withLen = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.doc") < col("b.doc") &&
          col("a.n").cast("double") >= lit(threshold) * col("b.n") - lit(eps) &&
          col("b.n").cast("double") >= lit(threshold) * col("a.n") - lit(eps))
      .select(col("a.doc"), col("b.doc")).distinct().count()
    val reqFactor = threshold / (1.0 + threshold)
    val withPos = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.doc") < col("b.doc") &&
          col("a.n").cast("double") >= lit(threshold) * col("b.n") - lit(eps) &&
          col("b.n").cast("double") >= lit(threshold) * col("a.n") - lit(eps))
      .groupBy(col("a.doc").as("d1"), col("b.doc").as("d2"),
        col("a.n").as("n1"), col("b.n").as("n2"))
      .agg(min(col("a.rk")).as("r1"), min(col("b.rk")).as("r2"))
      .where((lit(1L) + least(col("n1") - col("r1"), col("n2") - col("r2")))
        .cast("double") >= lit(reqFactor) * (col("n1") + col("n2")) - lit(eps))
      .count()
    println(s"[prefix-bench] candidates prefix-only=$prefixOnly " +
      s"+length=$withLen +positional=$withPos")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prefix-bench] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$r")
    }
    time("jaccardPairsPrefix e2e") {
      graft.pipeline.Dedup.jaccardPairsPrefix(docs, "text", "doc_id", w, threshold).count()
    }
    time("jaccardPairsPrefix e2e 2nd") {
      graft.pipeline.Dedup.jaccardPairsPrefix(docs, "text", "doc_id", w, threshold).count()
    }
    spark.stop()
  }
}
