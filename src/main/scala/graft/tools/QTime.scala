package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused per-query timer: `runMain graft.tools.QTime <sfDir> <reps>
  * <name>...` runs just the named SparkEntry queries `reps` times in
  * one warm session and prints per-rep seconds plus the median — the
  * cheap way to check one query's perf claim without the full
  * BenchRepeat sweep.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: QTime <sfDir> <reps> <name>...")
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val med = ts.sorted.apply(ts.length / 2)
      println(f"QTIME $name%-28s median=$med%6.2f s reps=[" +
        ts.map(t => f"$t%.2f").mkString(", ") + "]")
    }
    spark.stop()
  }
}
