package graft.tools

import graft.functions.VectorFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Float-codegen vs int8-UDF retrieval timing on a replicated corpus —
  * the evidence behind the int8 story: the compute kernel may or may
  * not beat whole-stage-codegen float cosine at a given size, but the
  * scan/broadcast byte cut is structural.
  */
object Int8Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 128
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val big = emb.crossJoin(spark.range(0, reps).select(col("id").as("rep")))
      .select((col("vec_id") * reps + col("rep")).as("vec_id"), col("embedding"))
      .localCheckpoint(true)
    val n = big.count()
    // quantize once (what a real deployment stores on disk)
    val codes = big.select(col("vec_id"),
        graft.pipeline.Similarity.int8Codes(col("embedding")).as("c"))
      .localCheckpoint(true)
    codes.count()

    def time(label: String)(f: => Unit): Double = {
      f // warm
      val t0 = System.nanoTime(); f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-22s $s%7.2f s   (n=$n)")
      s
    }
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    time("float cosine (codegen)") {
      big.crossJoin(broadcast(q))
        .select(col("vec_id"), cosineSimD(col("embedding"), col("qv")).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(5).collect()
    }
    val qc = codes.where(col("vec_id") === 0).select(col("c").as("qc"))
    time("int8 (codegen expr)") {
      codes.crossJoin(broadcast(qc))
        .select(col("vec_id"), int8CosineSim(col("c"), col("qc")).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(5).collect()
    }
    spark.stop()
  }
}
