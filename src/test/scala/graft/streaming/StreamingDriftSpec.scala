package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Distribution-shift monitor: a stable stream raises no alerts, a
  * staged late-drift stream alerts exactly on the drifted batches,
  * and the running baseline accumulates every prior batch.
  */
class StreamingDriftSpec extends SparkTestBase {

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")
    .select(col("doc_id"), col("lang"))

  private def monitor(src: String, alertTv: Double): Seq[(Long, Long, Long, Double, Boolean)] = {
    val out = java.nio.file.Files.createTempDirectory("sdrift_out")
      .resolve("monitor").toString
    StreamingDrift.ingest(spark, src, "doc_id", "lang", out,
      nBatches = 4, alertTv = alertTv)
    spark.read.parquet(out).orderBy("batch_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5))).toSeq
  }

  test("stable stream: no alerts; baseline accumulates prior batches") {
    val src = java.nio.file.Files.createTempDirectory("sdrift_st")
      .resolve("docs.parquet").toString
    docs.write.parquet(src)
    val rows = monitor(src, alertTv = 0.3)
    assert(rows.length == 4)
    assert(rows.head._4 == 0.0 && !rows.head._5) // no baseline yet
    assert(rows.forall(r => !r._5 && r._4 >= 0.0 && r._4 <= 1.0))
    // n_prev is the cumulative sum of earlier batch sizes
    rows.sliding(2).foreach { case Seq(a, b) =>
      assert(b._3 == a._3 + a._2)
    }
  }

  test("null dim values count as their own category, not an NPE") {
    val src = java.nio.file.Files.createTempDirectory("sdrift_nl")
      .resolve("docs.parquet").toString
    // a third of the corpus loses its language label
    docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, lit(null).cast("string"))
          .otherwise(col("lang")).as("lang"))
      .write.parquet(src)
    val rows = monitor(src, alertTv = 0.3)
    assert(rows.length == 4)
    assert(rows.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
    // the null share is id-uniform, so the stable mix stays quiet
    assert(rows.forall(!_._5))
  }

  test("baseline swap recovers from a crash between park and promote") {
    import scala.collection.mutable
    val out = java.nio.file.Files.createTempDirectory("sdrift_bl")
      .resolve("monitor").toString
    DriftState.save(spark, out, mutable.Map("en" -> 7L, "de" -> 3L))
    // simulate a crash that parked the live baseline and died before
    // the promote: live copy missing, parked copy present
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"${out}__baseline")
    val old = new org.apache.hadoop.fs.Path(s"${out}__baseline__old")
    assert(fs.rename(live, old))
    val acc = DriftState.load(spark, out) // recovery preamble restores
    assert(acc == mutable.Map("en" -> 7L, "de" -> 3L))
    assert(fs.exists(live) && !fs.exists(old))
    // a save over the recovered baseline still swaps cleanly
    DriftState.save(spark, out, mutable.Map("en" -> 9L))
    assert(DriftState.load(spark, out) == mutable.Map("en" -> 9L))
  }

  test("cross-run continuity: a second run starts from the persisted baseline") {
    val src = java.nio.file.Files.createTempDirectory("sdrift_cr")
      .resolve("docs.parquet").toString
    docs.write.parquet(src)
    val out = java.nio.file.Files.createTempDirectory("sdrift_cr_o")
      .resolve("monitor").toString
    StreamingDrift.ingest(spark, src, "doc_id", "lang", out,
      nBatches = 4, alertTv = 0.3)
    val total = docs.count()
    // the second run is a NEW increment (shifted ids, same stable
    // lang mix) — an identical rerun of the FIRST increment would key
    // the same ledger namespace and correctly no-op (the crash-heal
    // contract); a real day-2 batch has new content and a new key
    val src2 = java.nio.file.Files.createTempDirectory("sdrift_cr2")
      .resolve("docs.parquet").toString
    docs.select((col("doc_id") + total).as("doc_id"), col("lang"))
      .write.parquet(src2)
    StreamingDrift.ingest(spark, src2, "doc_id", "lang", out,
      nBatches = 4, alertTv = 0.3)
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getBoolean(5)))
    assert(rows.length == 8)
    assert(rows.map(_._1).distinct.length == 2) // two runs, disambiguated
    // the second run's FIRST batch already has the first run's whole
    // corpus as baseline — and the same stable mix raises no alert
    val secondRun = rows.groupBy(_._1).values.find(_.exists(r =>
      r._2 == 0L && r._3 > 0L)).get
    assert(secondRun.find(_._2 == 0L).get._3 == total)
    assert(secondRun.forall(!_._4))
  }

  test("late drift alerts exactly on the drifted batches") {
    val d = docs
    val off = d.agg(max(col("doc_id"))).head().getLong(0) + 1
    val src = java.nio.file.Files.createTempDirectory("sdrift_dr")
      .resolve("docs.parquet").toString
    d.unionByName(d.where(col("lang") === "en")
        .select((col("doc_id") + off).as("doc_id"), col("lang")))
      .write.parquet(src)
    val rows = monitor(src, alertTv = 0.3)
    assert(rows.length == 4)
    // early (mixed) batches quiet, late (all-en) batches loud
    assert(!rows(0)._5 && !rows(1)._5)
    assert(rows(2)._5 && rows(3)._5)
  }

  test("a miswired high-cardinality dim errors loudly instead of OOMing the driver") {
    import org.apache.spark.sql.functions.col
    val wide = spark.range(DriftState.MaxCategories + 1L)
      .select(col("id"), col("id").cast("string").as("dim"))
    val e = intercept[IllegalArgumentException] {
      DriftState.batchCounts(wide, "dim")
    }
    assert(e.getMessage.contains("distinct values"))
    // at the cap exactly: still fine (the contract's generous ceiling)
    val ok = spark.range(100L)
      .select(col("id").cast("string").as("dim"))
    assert(DriftState.batchCounts(ok, "dim").size == 100)
  }
}
