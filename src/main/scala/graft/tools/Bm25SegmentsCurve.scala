package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serve-cost curve for the LEXICAL multi-segment read path — the
  * [[SegmentsCurve]] experiment on [[graft.pipeline.Bm25]]: the same
  * sf0.1 documents corpus split into 1/2/4/8/16 complete bm25
  * segment roots (the shape the segment-per-microbatch ingest
  * writes), served through `Bm25.searchSegments`. The cost model
  * under test: per segment the serve pays (a) a stats read (one tiny
  * parquet), (b) a bucket-pruned df read and (c) a bucket-pruned,
  * page-pruned postings scan — all bounded by QUERY TERMS, never the
  * corpus — plus two driver-side merges (global N/T sum; global
  * per-term df sum, ≤ terms rows per segment). So the curve should
  * be near-flat with a mild per-segment fixed cost (the scan-task
  * and footer overheads), exactly the knob merge cadence controls.
  * `sbt "runMain graft.tools.Bm25SegmentsCurve [sfDir]"`.
  */
object Bm25SegmentsCurve {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.Bm25

    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    val queries = Seq(0L -> "hash join", 1L -> "fast table scan",
      2L -> "merge sort window")

    Seq(1, 2, 4, 8, 16).foreach { nSegs =>
      val base = java.nio.file.Files.createTempDirectory(s"bmsegc_$nSegs")
      val segs = (0 until nSegs).map { i =>
        val seg = base.resolve(s"seg$i").toString
        Bm25.writeIndex(spark,
          docs.where(pmod(col("doc_id"), lit(nSegs.toLong)) === i),
          "text", "doc_id", seg)
        seg
      }
      def once(): Double = {
        val t0 = System.nanoTime()
        Bm25.searchSegments(spark, segs, queries, k = 10).count()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val reps = Seq(once(), once(), once()).sorted
      println(f"[bmsegc] segments=$nSegs%2d docs=$n%8d " +
        f"serve median=${reps(1)}%6.3f s " +
        f"reps=[${reps.map(t => f"$t%.3f").mkString(", ")}]")
    }
    spark.stop()
  }
}
