package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-fold cost curve for the distributed trainers: the r13 flat
  * `trainDistributed` collected nlist × dim `(cluster, pos, sum,
  * count)` Rows PER ITERATION (~17M Rows at nlist 2^16 × dim 256 —
  * corpus-independent, but a real driver bottleneck at large nlist);
  * r14 packs the fold into one [[graft.functions.FixedVecSum]]
  * aggregation per cluster, so the driver receives nlist
  * `[count, sums…]` rows. This harness measures exactly the piece
  * that changed — the shuffle + collect + driver decode of one
  * Lloyd's fold — under both shapes at nlist 1k/4k/16k/64k.
  *
  * Setup: the sf embeddings replicated (ids re-keyed) to ≥ 2·64k rows
  * so every nlist has enough rows, with the cluster assignment
  * REPLACED by the deterministic `pmod(splitmix64(id), nlist)` — the
  * assignment scan is IDENTICAL in both shapes (same IvfNearest
  * column), so pinning it out isolates the fold and keeps nlist 64k
  * measurable (a real flat assignment at 64k centroids is the
  * O(corpus · nlist · dim) wall the hierarchical trainer exists to
  * avoid). Both folds produce the same per-cluster integer sums —
  * asserted per nlist, so the harness doubles as an equivalence
  * check on real vector data.
  *
  * `sbt "runMain graft.tools.TrainCurve [sfDir]"`.
  */
object TrainCurve {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val base = emb.count()
    val dim = emb.select(max(size(col("embedding")))).head().getInt(0)
    val replicas = math.max(1L, (2L * 65536L + base - 1) / base)
    val F = graft.pipeline.Ivf.TrainFixedPointScale
    // re-keyed replicas: same real vectors, corpus-scale row count
    val corpus = emb
      .crossJoin(spark.range(replicas).select(col("id").as("_r")))
      .select((col("vec_id") * replicas + col("_r")).as("_id"),
        col("embedding").cast("array<float>").as("_v"))
      .localCheckpoint(true)
    println(s"[traincurve] corpus=${base}x$replicas dim=$dim")

    Seq(1 << 10, 1 << 12, 1 << 14, 1 << 16).foreach { nlist =>
      val assigned = corpus.select(
        pmod(graft.functions.HashFunctions.splitmix64(col("_id"), 42L),
          lit(nlist.toLong)).cast("int").as("_c"),
        col("_v"))

      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }

      // r13 shape: explode to (cluster, pos) cells, collect nlist × dim
      val (oldRows, tOld) = timed {
        assigned
          .select(col("_c"), posexplode(col("_v")))
          .where(col("pos") < dim)
          .groupBy(col("_c"), col("pos"))
          .agg(sum(round(col("col").cast("double") * F).cast("long")).as("s"),
            count(lit(1)).as("n"))
          .collect()
      }
      // r14 shape: packed per-cluster FixedVecSum, collect nlist rows
      val (newRows, tNew) = timed {
        assigned
          .select(col("_c"),
            transform(col("_v"),
              x => round(x.cast("double") * F).cast("long")).as("_lv"))
          .groupBy(col("_c"))
          .agg(graft.functions.FixedVecSum.fixedVecSum(col("_lv"), dim)
            .as("_buf"))
          .collect()
      }
      // equivalence: identical per-(cluster, pos) integer sums
      val oldSums = oldRows.map(r =>
        (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      newRows.foreach { r =>
        val c = r.getInt(0)
        val (_, s) = graft.functions.FixedVecSum.decode(r.getSeq[Long](1), dim)
        s.zipWithIndex.foreach { case (v, i) =>
          val o = oldSums.getOrElse((c, i), 0L)
          require(o == v, s"fold divergence at cluster $c pos $i: $o vs $v")
        }
      }
      println(f"[traincurve] nlist=$nlist%6d " +
        f"old_cells=${oldRows.length}%8d " +
        f"old_vals=${oldRows.length * 4L}%9d " + // (c, pos, s, n) per cell
        f"old=$tOld%7.2f s new_rows=${newRows.length}%6d new=$tNew%7.2f s " +
        f"speedup=${tOld / tNew}%5.2f x")
    }
    spark.stop()
  }
}
