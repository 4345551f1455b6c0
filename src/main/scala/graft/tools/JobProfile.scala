package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-JOB time attribution for one SparkEntry query (optimization
  * harness, not driver contract): runs the named query `reps` times in
  * a bench-shaped session and prints, for the LAST rep, every Spark
  * job's wall duration, task count, and call site — plus the wall time
  * NOT inside any job (driver-side planning/FS gaps). The fixed
  * per-job cost is the dominant term of the index-lifecycle rows at
  * bench scale, so the first question for any slow row is "how many
  * jobs, and which phase owns them" — this answers it mechanically.
  *
  * usage: runMain graft.tools.JobProfile <sfDir> <reps> <name>...
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: JobProfile <sfDir> <reps> <name>...")
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

    case class Job(id: Int, start: Long, var end: Long, tasks: Int,
                   site: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        jobs.put(e.jobId,
          Job(e.jobId, e.time, -1L,
            e.stageInfos.map(_.numTasks).sum, site))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.end = e.time
      }
    })

    names.foreach { name =>
      var lastWall = 0.0
      (1 to reps).foreach { rep =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        graft.core.Scratch.sweep()
        jobs.clear()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        lastWall = (System.nanoTime() - t0) / 1e9
        println(f"[jobprofile] $name rep $rep: $lastWall%.2f s, " +
          s"${jobs.size} jobs")
      }
      import scala.jdk.CollectionConverters._
      val js = jobs.values.asScala.toSeq.sortBy(_.start)
      val inJobs = js.filter(_.end > 0).map(j => j.end - j.start).sum / 1e3
      println(f"[jobprofile] $name LAST rep: wall $lastWall%.2f s, " +
        f"sum-of-job-walls $inJobs%.2f s (jobs may overlap), " +
        s"${js.size} jobs")
      // jobs sorted by duration, with start offsets so phases read off
      val t0 = if (js.nonEmpty) js.map(_.start).min else 0L
      js.sortBy(j => -(j.end - j.start)).take(40).foreach { j =>
        println(f"[jobprofile]   job ${j.id}%4d +${(j.start - t0) / 1e3}%7.2fs " +
          f"${(j.end - j.start) / 1e3}%7.3fs ${j.tasks}%5d tasks  ${j.site}")
      }
    }
    spark.stop()
  }
}
