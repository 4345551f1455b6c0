package graft.tools

import org.apache.spark.sql.SparkSession

/** Runs the full bench suite N times back-to-back in ONE JVM/session
  * and prints per-run, per-query timings plus min/median/max spread —
  * the error bar for round-over-round comparisons (driver-session
  * captures run up to ~1.6× hot vs quiet runs; this quantifies which
  * queries wobble and by how much WITHIN one session).
  */
object BenchRepeat {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    val runs = (1 to reps).map { r =>
      val timings = names.map { name =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        name -> sec
      }.toMap
      println(f"RUN $r total=${timings.values.sum}%.1f s")
      timings
    }
    val spread = names.map { n =>
      val ts = runs.map(_(n)).sorted
      val med = ts(ts.length / 2)
      (n, ts.head, med, ts.last, ts.last - ts.head)
    }.sortBy(-_._5)
    println(f"${"query"}%-24s ${"min"}%8s ${"med"}%8s ${"max"}%8s ${"spread"}%8s")
    spread.take(12).foreach { case (n, mn, md, mx, sp) =>
      println(f"$n%-24s $mn%8.2f $md%8.2f $mx%8.2f $sp%8.2f")
    }
    val totals = runs.map(_.values.sum).sorted
    println(f"TOTALS min=${totals.head}%.1f med=${totals(totals.length / 2)}%.1f " +
      f"max=${totals.last}%.1f over $reps runs")
    spark.stop()
  }
}
