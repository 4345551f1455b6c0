package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Snapshot/restore protocol contracts: restore refuses a snapshot
  * without a manifest (crashed create) and a truncated file
  * (integrity), restore works over an ABSENT live layout, a second
  * snapshot to the same dir is refused, and the restore swap heals
  * from the parked crash state like every other swapped layout.
  */
class DirSnapshotSpec extends SparkTestBase {

  private def fs = new org.apache.hadoop.fs.Path("/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeLayout(path: String): Unit =
    spark.range(100).select(col("id"), (col("id") % 7).as("part"))
      .write.partitionBy("part").parquet(path)

  private def readIds(path: String): Set[Long] =
    spark.read.parquet(path).select("id").collect().map(_.getLong(0)).toSet

  test("create + wreck + restore round-trips; absent live restores too") {
    val base = java.nio.file.Files.createTempDirectory("snap_rt")
    val live = base.resolve("layout").toString
    val snap = base.resolve("snap").toString
    writeLayout(live)
    val want = readIds(live)
    DirSnapshot.create(spark, live, snap)
    // wreck: drop a partition dir and append junk
    fs.delete(new org.apache.hadoop.fs.Path(s"$live/part=0"), true)
    spark.range(900, 950).select(col("id"), lit(3L).as("part"))
      .write.mode("append").partitionBy("part").parquet(live)
    assert(readIds(live) != want)
    DirSnapshot.restore(spark, snap, live)
    assert(readIds(live) == want)
    // absent live: delete entirely, restore again
    fs.delete(new org.apache.hadoop.fs.Path(live), true)
    DirSnapshot.restore(spark, snap, live)
    assert(readIds(live) == want)
    // snapshots are immutable: a retake to the same dir is refused
    intercept[IllegalArgumentException] {
      DirSnapshot.create(spark, live, snap)
    }
  }

  test("restore refuses a manifest-less (crashed-create) snapshot and " +
      "a truncated file") {
    val base = java.nio.file.Files.createTempDirectory("snap_bad")
    val live = base.resolve("layout").toString
    val snap = base.resolve("snap").toString
    writeLayout(live)
    DirSnapshot.create(spark, live, snap)
    // no manifest: simulate the crashed create (tmp never renamed)
    val noMf = base.resolve("half").toString
    fs.mkdirs(new org.apache.hadoop.fs.Path(noMf))
    intercept[IllegalArgumentException] {
      DirSnapshot.restore(spark, noMf, live)
    }
    // truncated file: shrink one data file inside the snapshot
    val snapDir = new java.io.File(snap)
    def firstParquet(d: java.io.File): java.io.File = {
      val fsl = d.listFiles()
      fsl.find(f => f.isFile && f.getName.endsWith(".parquet"))
        .getOrElse(firstParquet(fsl.filter(_.isDirectory).head))
    }
    val victim = firstParquet(snapDir)
    val ch = new java.io.RandomAccessFile(victim, "rw")
    try ch.setLength(victim.length() - 1) finally ch.close()
    val before = readIds(live)
    intercept[IllegalArgumentException] {
      DirSnapshot.restore(spark, snap, live)
    }
    // the refused restore touched nothing
    assert(readIds(live) == before)
  }

  test("a crash between the restore's park and promote heals on the " +
      "next reader (DirSwap contract)") {
    val base = java.nio.file.Files.createTempDirectory("snap_crash")
    val live = base.resolve("layout").toString
    writeLayout(live)
    val want = readIds(live)
    // simulate the crash state: live parked at __old, no live dir
    val lp = new org.apache.hadoop.fs.Path(live)
    assert(fs.rename(lp, DirSwap.old(lp)))
    // any family reader's preamble heals it; snapshot.create runs it
    val snap = base.resolve("snap").toString
    DirSnapshot.create(spark, live, snap)
    assert(readIds(live) == want)
  }
}
