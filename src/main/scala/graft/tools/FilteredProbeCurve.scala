package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost/recall sweep for PAYLOAD-FILTERED ANN across selectivity —
  * the number behind the adaptive-widening design: at each filter
  * selectivity (fraction of the corpus matching), compare
  *
  *  - FIXED probe at nprobe0 (the naive filter-inside-search): time
  *    and the fill rate (queries holding k survivors — the failure
  *    mode the widening exists to prevent);
  *  - ADAPTIVE per-query widening ([[graft.pipeline.Ivf.searchFiltered]]):
  *    time and recall@k against brute force over the filtered corpus.
  *
  * The claim under test: fixed probes under-fill as selectivity
  * drops (sel × corpus/nlist × nprobe0 < k), while the adaptive path
  * stays filled at a cost that grows only with the rounds the
  * STRAGGLER queries need — not |queries| × widest probe.
  * `sbt "runMain graft.tools.FilteredProbeCurve [sfDir]"`.
  */
object FilteredProbeCurve {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.{Ivf, Similarity}

    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 64, iters = 3)
    val postings = Ivf.assign(emb, "embedding", model).localCheckpoint(true)
    val qs = emb.where(col("vec_id") < 10).localCheckpoint(true)
    val k = 5
    val nprobe0 = 4

    // selectivity via modulus on vec_id: 1/m of the corpus matches
    Seq(2L, 8L, 32L, 128L).foreach { m =>
      val f = col("vec_id") % m === 0
      val matches = emb.where(f).count()
      val truth = Similarity.bruteForceTopK(emb.where(f), qs,
        "embedding", "vec_id", k).localCheckpoint(true)
      val denom = truth.groupBy(col("qid"))
        .agg(least(lit(k.toLong), count(lit(1))).as("d"))
        .agg(coalesce(sum(col("d")), lit(0L))).head().getLong(0)

      def timeIt(body: => org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
        val t0 = System.nanoTime()
        val res = body.localCheckpoint(true)
        val t = (System.nanoTime() - t0) / 1e9
        val filled = res.groupBy(col("qid")).count()
          .where(col("count") >= k).count()
        val hits = Similarity.recallAtK(truth, res, k)
          .agg(coalesce(sum(col("hits")), lit(0L))).head().getLong(0)
        graft.core.Pinned.release(res)
        (t, filled, hits)
      }
      // warm both paths once, then measure
      timeIt(Ivf.search(postings.where(f), qs, "embedding", "vec_id",
        model, k, nprobe0))
      val (tF, filledF, hitsF) = timeIt(Ivf.search(postings.where(f), qs,
        "embedding", "vec_id", model, k, nprobe0))
      timeIt(Ivf.searchFiltered(postings, qs, "embedding", "vec_id",
        model, k, f, nprobe0))
      val (tA, filledA, hitsA) = timeIt(Ivf.searchFiltered(postings, qs,
        "embedding", "vec_id", model, k, f, nprobe0))
      graft.core.Pinned.release(truth)
      println(f"[fpc] sel=1/$m%-4d (${matches}%5d of $n) " +
        f"fixed: ${tF}%5.2f s filled=$filledF%2d/10 recall=${hitsF.toDouble / denom}%.2f | " +
        f"adaptive: ${tA}%5.2f s filled=$filledA%2d/10 recall=${hitsA.toDouble / denom}%.2f")
    }
    spark.stop()
  }
}
