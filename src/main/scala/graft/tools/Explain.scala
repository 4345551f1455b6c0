package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted plans for selected queries (plan-quality review). */
object Explain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q1_agg", "q3_topn_revenue", "q5_nation_revenue",
        "vdb_topk_cosine", "ann_topk_batch", "vdb_get_byid")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"========== $n ==========")
      n match {
        case "_train_dist_agg" =>
          // the per-iteration aggregation inside Ivf.trainDistributed
          // (it collects eagerly, so the row plans can't show it):
          // assignment + posexplode must PARTIALLY aggregate to
          // (cluster, pos) keys before the exchange — nlist × dim
          // rows per partition is all that shuffles
          import org.apache.spark.sql.functions._
          val emb = spark.read.parquet(s"$d/embeddings.parquet")
            .select(col("vec_id"), col("embedding"))
          val model = graft.pipeline.Ivf.train(emb, "embedding", "vec_id",
            nlist = 16, iters = 1)
          val F = graft.pipeline.Ivf.TrainFixedPointScale
          emb.select(graft.functions.ColumnBridge.column(
                graft.pipeline.IvfNearest(
                  graft.functions.ColumnBridge.expression(
                    col("embedding").cast("array<float>")), model, 1))
                .getItem(0).as("_c"),
              posexplode(col("embedding").cast("array<float>")))
            .where(col("pos") < 64)
            .groupBy(col("_c"), col("pos"))
            .agg(sum(round(col("col").cast("double") * F).cast("long"))
              .as("s"), count(lit(1)).as("n"))
            .explain("formatted")
        case "_moments_agg" =>
          // Pca.trainDistributed's one-pass FixedMoments aggregate:
          // ObjectHashAggregate with partial merge — one ~16 KB
          // buffer per partition shuffles
          import org.apache.spark.sql.functions._
          val emb = spark.read.parquet(s"$d/embeddings.parquet")
          emb.agg(graft.functions.FixedMoments.fixedMoments(
            col("embedding"), 64)).explain("formatted")
        case _ =>
          graft.SparkEntry.queries(n)(spark, d).explain("formatted")
      }
    }
    spark.stop()
  }
}
