package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object WmDebug {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("wm_dbg")
    val streamDir = Files.createDirectory(root.resolve("stream"))
    def writeBatch(i: Int, rows: Seq[(String, String, Double)]): Unit = {
      val tmp = root.resolve(s"tmp$i").toString
      rows.toDF("t", "event_type", "value")
        .select(to_timestamp(col("t")).as("ts"), col("event_type"), col("value"))
        .coalesce(1).write.parquet(tmp)
      val part = Files.list(Paths.get(tmp)).filter(
        _.getFileName.toString.endsWith(".parquet")).findFirst.get
      val dst = streamDir.resolve(f"b$i%03d.parquet")
      Files.move(part, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1000L * (i + 1)))
    }
    writeBatch(0, Seq(("2026-01-01 10:05:00", "click", 1.0),
      ("2026-01-01 12:30:00", "view", 5.0)))
    writeBatch(1, Seq(("2026-01-01 13:45:00", "click", 7.0)))
    writeBatch(2, Seq(("2026-01-01 10:15:00", "click", 99.0),
      ("2026-01-01 15:45:00", "click", 8.0)))
    val schema = s.read.parquet(streamDir.toString).schema
    val sdf = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
    val agg = graft.streaming.EventStream.hourlyWindowed(sdf)
    val q = agg.writeStream.format("memory").queryName("dbg")
      .outputMode("append").start()
    q.processAllAvailable(); 
    q.recentProgress.foreach(p => println(
      s"[dbg] batch=${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")}"))
    q.stop()
    s.table("dbg").orderBy("window").show(false)
    s.stop()
  }
}
