package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale curve for the SPARSE serving tier: grow the inverted
  * postings layout 1×/2×/4×/8× (replicated embeddings, offset ids,
  * same frozen sparsification) and time `Sparse.searchIndex` for a
  * fixed query set — the claim under test is that query cost tracks
  * the QUERY dims' posting-list lengths. Those lists grow linearly
  * with a replicated corpus (every copy re-activates the same dims),
  * so the honest expectation here is k ≈ 1 on replication — the
  * sub-linear win at real scale comes from dim-bucket pruning
  * against the VOCABULARY (queries touch a fixed dim set however
  * many dims the corpus adds), which replication cannot exercise at
  * dim=64; the curve pins the absolute costs and the per-bucket
  * read shape instead.
  * `sbt "runMain graft.tools.SparseProbeCurve [sfDir]"`.
  */
object SparseProbeCurve {
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
    val n = emb.count()
    val qs = Sparse.sparsify(emb.where(col("vec_id") < 4), "embedding",
      "vec_id").localCheckpoint(true)

    val times = Seq(1, 2, 4, 8).map { factor =>
      val corpus = (0 until factor).map(i =>
          emb.select((col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
            col("embedding")))
        .reduce(_ unionByName _)
      val idx = java.nio.file.Files.createTempDirectory(s"spc_$factor")
        .resolve("index").toString
      Sparse.writeIndex(Sparse.sparsify(corpus, "embedding", "vec_id"), idx)
      def once(): Double = {
        val t0 = System.nanoTime()
        Sparse.searchIndex(spark, idx, qs, k = 10).count()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val reps = Seq(once(), once(), once()).sorted
      println(f"[spc] rows=${factor * n}%8d probe median=${reps(1)}%6.3f s " +
        f"reps=[${reps.map(t => f"$t%.3f").mkString(", ")}]")
      (factor.toDouble, reps(1))
    }
    val lx = times.map(t => math.log(t._1))
    val ly = times.map(t => math.log(t._2))
    val mx = lx.sum / lx.size
    val my = ly.sum / ly.size
    val k = lx.zip(ly).map { case (x, y) => (x - mx) * (y - my) }.sum /
      lx.map(x => (x - mx) * (x - mx)).sum
    println(f"[spc] fitted growth exponent k=$k%.2f (1.0 = linear in index size)")
    spark.stop()
  }
}
