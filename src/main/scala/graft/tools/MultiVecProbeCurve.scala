package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale curve for the MULTI-VECTOR (late-interaction) serve: grow
  * the paired layout 1×/2×/4×/8× (replicated embeddings as 4-vector
  * docs with offset ids, one frozen coarse quantizer) and time
  * `MultiVector.searchIndex` at a PARTIAL probe for a fixed query
  * set — the PLAID decomposition's claim under test is that probe
  * bytes follow nprobe/nlist and gather bytes follow candidate count
  * × vectors/doc, never corpus size. Replication grows every probed
  * cell's membership linearly, so candidates — and the honest
  * expectation for the growth exponent — are k ≈ 1 here; the
  * sub-linear win at real scale is the cluster prune (a fixed query
  * set touches nprobe/nlist of whatever the corpus adds), which
  * replication cannot exercise. The curve pins the absolute costs,
  * the candidate-bound arithmetic, and the gather's count-gate
  * behavior on a grown index.
  * `sbt "runMain graft.tools.MultiVecProbeCurve [sfDir]"`.
  */
object MultiVecProbeCurve {
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
    val n = emb.count()
    val nlist = 64
    val nprobe = 4
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = nlist,
      iters = 3)
    val queryVecs = emb.where(col("vec_id") < 4)
      .select((col("vec_id") / 2).cast("long").as("qid"),
        col("embedding").as("vec"))
      .localCheckpoint(true)
    val nQueryVecs = queryVecs.count()
    // the query pin's block set, to survive the per-rep sweep below
    val baselinePins = spark.sparkContext.getPersistentRDDs.keySet

    val times = Seq(1, 4, 16, 64).map { factor =>
      val docVecs = (0 until factor).map(i =>
          emb.select(
            ((col("vec_id") / 4).cast("long") + lit(i.toLong * 10000000L))
              .as("doc"),
            col("embedding").as("vec")))
        .reduce(_ unionByName _)
      val root = java.nio.file.Files.createTempDirectory(s"mvpc_$factor")
        .toString
      MultiVector.writeIndex(spark, docVecs, model, root)
      // the candidate bound the verdict asks to document: candidates
      // per serve ≤ query vectors × nprobe × mean cell occupancy
      // (docs/cell ≈ rows / 4 / nlist for 4-vector docs)
      val bound = nQueryVecs * nprobe * (factor * n / 4.0 / nlist)
      def once(): Double = {
        // release prior reps' result pins so block accumulation never
        // taxes the next measurement (the Bench cleanup rule); the
        // query frame's own pin is excluded via the baseline set
        spark.sparkContext.getPersistentRDDs
          .filterNot { case (id, _) => baselinePins.contains(id) }
          .values.foreach(_.unpersist(true))
        val t0 = System.nanoTime()
        MultiVector.searchIndex(spark, root, queryVecs, model, k = 5,
          nprobe = nprobe).count()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val reps = Seq(once(), once(), once()).sorted
      println(f"[mvpc] rows=${factor * n}%8d serve median=${reps(1)}%6.3f s " +
        f"cand_bound=${bound}%8.0f " +
        f"reps=[${reps.map(t => f"$t%.3f").mkString(", ")}]")
      (factor.toDouble, reps(1))
    }
    val lx = times.map(t => math.log(t._1))
    val ly = times.map(t => math.log(t._2))
    val mx = lx.sum / lx.size
    val my = ly.sum / ly.size
    val k = lx.zip(ly).map { case (x, y) => (x - mx) * (y - my) }.sum /
      lx.map(x => (x - mx) * (x - mx)).sum
    println(f"[mvpc] fitted growth exponent k=$k%.2f (1.0 = linear in index size)")
    spark.stop()
  }
}
