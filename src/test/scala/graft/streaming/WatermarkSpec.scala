package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Real watermark semantics of the windowed aggregation: in append
  * mode a window is emitted once the watermark passes its end, and a
  * row arriving LATER than the watermark is dropped — it must not
  * reopen or change the finalized window. (The oracle-checked
  * stream_hourly runs complete mode over a static source; this spec
  * covers the unbounded-source contract.)
  */
class WatermarkSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("ts", TimestampType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  private def writeBatch(dir: java.nio.file.Path, name: String,
                         rows: Seq[(String, String, Double)]): Unit = {
    import spark.implicits._
    val df = rows.toDF("t", "event_type", "value")
      .select(to_timestamp(col("t")).as("ts"), col("event_type"), col("value"))
    val staging = java.nio.file.Files.createTempDirectory("wm_stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = java.nio.file.Files.list(staging).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.copy(part, dir.resolve(name))
  }

  test("append mode: late rows beyond the watermark are dropped") {
    val dir = java.nio.file.Files.createTempDirectory("wm_src")
    // batch 1: one row in window [00:00, 01:00), one far ahead at 03:00
    // (advances the watermark to 02:00 after the batch)
    writeBatch(dir, "b1.parquet", Seq(
      ("2026-01-01 00:30:00", "click", 1.0),
      ("2026-01-01 03:00:00", "click", 10.0)))
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val qn = "wm_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = EventStream.hourlyWindowed(stream).writeStream
      .format("memory").queryName(qn).outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: a LATE row for the already-closed [00:00, 01:00)
      // window (behind the 02:00 watermark) plus a fresh row
      writeBatch(dir, "b2.parquet", Seq(
        ("2026-01-01 00:45:00", "click", 100.0),
        ("2026-01-01 05:00:00", "click", 2.0)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(qn)
      .select(col("window.start").cast("string"), col("n"), col("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val w0 = rows.filter(_._1.startsWith("2026-01-01 00:00"))
    // the [00:00, 01:00) window finalized with ONLY the on-time row;
    // the late 100.0 never reopened it
    assert(w0.toSeq == Seq(("2026-01-01 00:00:00", 1L, 1.0)))
  }
}
