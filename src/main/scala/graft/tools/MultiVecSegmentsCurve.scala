package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serve-cost curve for the LATE-INTERACTION multi-segment read path
  * — [[SegmentsCurve]]'s experiment on `MultiVector.searchSegments`:
  * the sf0.1 corpus's (doc, vec) rows split into 1/2/4/8/16 pair
  * roots (disjoint docs; 64/128 added in r16 for the transient
  * bursty-day shape), served across segments. Cost model: one
  * batched model-witness read for ALL segments (the Ivf lesson,
  * inherited), then PER SEGMENT a probe → gather → rescore prefix
  * with two bounded driver collects (probed cells ≤ nlist; candidate
  * doc-buckets ≤ DocBuckets) and a candidate count — per-segment
  * DRIVER JOBS, the fixed-cost class the bm25/dense curves flagged.
  * This curve measures how much of that is real at small corpus
  * sizes. `sbt "runMain graft.tools.MultiVecSegmentsCurve [sfDir]"`.
  */
object MultiVecSegmentsCurve {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.{Ivf, MultiVector}

    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val docVecs = emb.select((col("vec_id") / 4).cast("long").as("doc"),
      col("embedding").as("vec")).localCheckpoint(true)
    val n = docVecs.count()
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 16, iters = 3)
    val queries = emb.where(col("vec_id") < 8)
      .select((col("vec_id") / 2).cast("long").as("qid"),
        col("embedding").as("vec")).localCheckpoint(true)
    val baselinePins = spark.sparkContext.getPersistentRDDs.keySet

    Seq(1, 2, 4, 8, 16, 64, 128).foreach { nSegs =>
      val base = java.nio.file.Files.createTempDirectory(s"mvsegc_$nSegs")
      val segs = (0 until nSegs).map { i =>
        val seg = base.resolve(s"seg$i").toString
        MultiVector.writeIndex(spark,
          docVecs.where(pmod(col("doc"), lit(nSegs.toLong)) === i),
          model, seg)
        seg
      }
      def once(): Double = {
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => baselinePins.contains(id) }
          .values.foreach(_.unpersist(true))
        val t0 = System.nanoTime()
        MultiVector.searchSegments(spark, segs, queries, model,
          k = 5, nprobe = 4).count()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val reps = Seq(once(), once(), once()).sorted
      println(f"[mvsegc] segments=$nSegs%2d vecs=$n%8d " +
        f"serve median=${reps(1)}%6.3f s " +
        f"reps=[${reps.map(t => f"$t%.3f").mkString(", ")}]")
    }
    spark.stop()
  }
}
