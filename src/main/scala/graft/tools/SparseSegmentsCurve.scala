package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Serve-cost curve for the SPARSE multi-segment read path —
  * [[SegmentsCurve]]'s experiment on `Sparse.searchSegments`: the
  * sf0.1 corpus sparsified and split into 1/2/4/8/16 dim-bucket
  * segment roots. Unlike the bm25/multivec serves (whose curves
  * found per-segment driver JOBS), this path already runs a constant
  * job count — per segment it only adds a relation construction and
  * scan legs — so the curve calibrates how much THAT costs.
  * `sbt "runMain graft.tools.SparseSegmentsCurve [sfDir]"`.
  */
object SparseSegmentsCurve {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.Sparse

    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val sp = Sparse.sparsify(emb, "embedding", "vec_id")
      .localCheckpoint(true)
    val n = sp.select(col("doc")).distinct().count()
    val q = Sparse.sparsify(emb.where(col("vec_id") < 4),
      "embedding", "vec_id").localCheckpoint(true)
    val baselinePins = spark.sparkContext.getPersistentRDDs.keySet

    Seq(1, 2, 4, 8, 16).foreach { nSegs =>
      val base = java.nio.file.Files.createTempDirectory(s"spsegc_$nSegs")
      val segs = (0 until nSegs).map { i =>
        val seg = base.resolve(s"seg$i").toString
        Sparse.writeIndex(
          sp.where(pmod(col("doc"), lit(nSegs.toLong)) === i), seg)
        seg
      }
      def once(): Double = {
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => baselinePins.contains(id) }
          .values.foreach(_.unpersist(true))
        val t0 = System.nanoTime()
        Sparse.searchSegments(spark, segs, q, k = 5).count()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val reps = Seq(once(), once(), once()).sorted
      println(f"[spsegc] segments=$nSegs%2d docs=$n%8d " +
        f"serve median=${reps(1)}%6.3f s " +
        f"reps=[${reps.map(t => f"$t%.3f").mkString(", ")}]")
    }
    spark.stop()
  }
}
