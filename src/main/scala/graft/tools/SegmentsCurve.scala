package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serve-cost curve for the MULTI-SEGMENT read path: the same sf0.1
  * corpus split into 1/2/4/8/16 int8 segment roots under one frozen
  * quantizer, served through `Ivf.readSegmentsServing` + searchCodes
  * — against the single merged layout as the floor. The claim under
  * test: serve cost is bounded by PROBE WORK (total postings in the
  * probed cells), not by segment count — the union adds only
  * per-segment scan tasks and driver-side model-witness loads (O(N)
  * driver parquet reads, the knob a serving deployment controls via
  * merge cadence). A flat curve here is what makes "serve before the
  * merge" a safe default rather than a performance cliff.
  * `sbt "runMain graft.tools.SegmentsCurve [sfDir]"`.
  */
object SegmentsCurve {
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
    val n = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 64, iters = 3)
    val queries = emb.where(col("vec_id") < 10).localCheckpoint(true)
    val baselinePins = spark.sparkContext.getPersistentRDDs.keySet

    Seq(1, 2, 4, 8, 16).foreach { nSegs =>
      val base = java.nio.file.Files.createTempDirectory(s"segc_$nSegs")
      val segs = (0 until nSegs).map { i =>
        val seg = base.resolve(s"seg$i").toString
        Ivf.writeIndexInt8(
          Ivf.assign(emb.where(pmod(col("vec_id"), lit(nSegs.toLong)) === i),
            "embedding", model), "embedding", seg)
        Ivf.saveModel(spark, model, Ivf.modelPath(seg))
        seg
      }
      def once(): Double = {
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => baselinePins.contains(id) }
          .values.foreach(_.unpersist(true))
        val t0 = System.nanoTime()
        Ivf.searchCodes(
          Ivf.readSegmentsServing(spark, segs, "vec_id", model),
          queries, "embedding", "vec_id", model, k = 5, nprobe = 4).count()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val reps = Seq(once(), once(), once()).sorted
      println(f"[segc] segments=$nSegs%2d rows=$n%8d " +
        f"serve median=${reps(1)}%6.3f s " +
        f"reps=[${reps.map(t => f"$t%.3f").mkString(", ")}]")
    }
    spark.stop()
  }
}
