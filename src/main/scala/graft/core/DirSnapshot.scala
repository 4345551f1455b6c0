package graft.core

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}

/** Point-in-time SNAPSHOT / RESTORE for persisted index layouts —
  * the backup/DR primitive of the serving stack (the vector-db
  * snapshot API shape): capture a quiesced layout's file tree, and
  * later swap it back over whatever the live tree has become
  * (failed migration, bad ingest, operator error).
  *
  * Consistency model: single-writer, quiesced capture — the same
  * contract every maintenance pass in the family already holds.
  * Parquet data files are immutable once committed, so a snapshot is
  * a plain recursive copy; what makes it SAFE is the protocol around
  * it:
  *  - `create` copies into `<snapDir>__tmp` and renames into place,
  *    with a `_manifest` (relative path + length per file) written
  *    LAST — a crashed create leaves no snapshot that [[restore]]
  *    would trust (no manifest ⇒ refused loudly).
  *  - `restore` verifies the manifest (every file present at its
  *    recorded length — a truncated copy fails before anything is
  *    touched), stages the copy beside the live layout, and swaps
  *    via the shared [[DirSwap.promote]] park-promote — a crash at
  *    any point leaves a complete layout live or parked, which every
  *    reader's recovery preamble already heals.
  *
  * 100 TB: the copy is the cost (snapshot bytes = layout bytes —
  * quantized tiers are the cheap thing to snapshot); the swap stays
  * two renames. Readers may serve the old layout until the promote,
  * never a half-restored one.
  */
object DirSnapshot {

  private val ManifestName = "_manifest"

  private def fsOf(spark: org.apache.spark.sql.SparkSession,
                   p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def walkFiles(fs: FileSystem, root: Path,
                        dir: Path): Seq[(String, Long)] = {
    // listStatus returns scheme-qualified paths — qualify the root
    // the same way or the relative-path strip silently no-ops
    val rootQ = fs.makeQualified(root).toString
    fs.listStatus(dir).toSeq.flatMap { st =>
      if (st.isDirectory) walkFiles(fs, root, st.getPath)
      else {
        val rel = st.getPath.toString.stripPrefix(rootQ).stripPrefix("/")
        require(rel != st.getPath.toString,
          s"manifest path ${st.getPath} escapes snapshot root $rootQ")
        Seq((rel, st.getLen))
      }
    }
  }

  /** Recursive tree copy with the per-FILE byte copies run on a
    * bounded driver-side pool: the walk (directory creation order)
    * stays sequential, but a layout is hundreds of small immutable
    * parquet files and copying them one at a time left the copy
    * latency-bound on per-file open/close — measured ~10% of a
    * whole *_restored drill row. Failure semantics unchanged: every
    * copy is awaited and the first failure propagates (the caller's
    * tmp dir is garbage either way until its final rename).
    */
  private def copyTree(fs: FileSystem, from: Path, to: Path): Unit = {
    val files = scala.collection.mutable.ArrayBuffer.empty[(Path, Path)]
    def walk(f: Path, t: Path): Unit = {
      fs.mkdirs(t)
      fs.listStatus(f).foreach { st =>
        val tt = new Path(t, st.getPath.getName)
        if (st.isDirectory) walk(st.getPath, tt)
        else files += ((st.getPath, tt))
      }
    }
    walk(from, to)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, math.max(1, files.size)))
    try {
      val futs = files.map { case (src, dst) =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit =
            require(FileUtil.copy(fs, src, fs, dst, false, false,
              fs.getConf), s"snapshot copy failed: $src")
        })
      }
      futs.foreach(_.get()) // await all; rethrows the first failure
    } catch {
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    } finally pool.shutdown()
  }

  /** Capture `layoutRoot` into `snapDir`. Refuses to overwrite an
    * existing snapshot (snapshots are immutable once taken — delete
    * explicitly to retake).
    */
  def create(spark: org.apache.spark.sql.SparkSession, layoutRoot: String,
             snapDir: String): Unit = {
    val root = new Path(layoutRoot)
    val snap = new Path(snapDir)
    val fs = fsOf(spark, root)
    DirSwap.recover(fs, root) // capture a healed layout, never a parked one
    require(fs.exists(root), s"nothing to snapshot at $layoutRoot")
    require(!fs.exists(snap), s"snapshot $snapDir already exists")
    val tmp = new Path(snapDir + "__tmp")
    fs.delete(tmp, true) // stale tmp from a crashed create
    copyTree(fs, root, tmp)
    val manifest = walkFiles(fs, tmp, tmp)
      .map { case (rel, len) => s"$rel\t$len" }.sorted.mkString("\n")
    val out = fs.create(new Path(tmp, ManifestName), false)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
    require(fs.rename(tmp, snap), s"snapshot publish failed: $snapDir")
  }

  /** Verify `snapDir`'s manifest and swap its contents over
    * `layoutRoot` (which may be absent, corrupted, or arbitrarily
    * grown since the capture).
    */
  def restore(spark: org.apache.spark.sql.SparkSession, snapDir: String,
              layoutRoot: String): Unit = {
    val root = new Path(layoutRoot)
    val snap = new Path(snapDir)
    val fs = fsOf(spark, root)
    val mf = new Path(snap, ManifestName)
    require(fs.exists(mf),
      s"$snapDir has no manifest — not a completed snapshot")
    val in = fs.open(mf)
    val manifest =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val want = manifest.split("\n").filter(_.nonEmpty).map { line =>
      val Array(rel, len) = line.split("\t")
      (rel, len.toLong)
    }
    want.foreach { case (rel, len) =>
      val p = new Path(snap, rel)
      require(fs.exists(p) && fs.getFileStatus(p).getLen == len,
        s"snapshot integrity: $rel missing or truncated")
    }
    val tmp = new Path(layoutRoot + "__restoretmp")
    fs.delete(tmp, true) // stale tmp from a crashed restore
    copyTree(fs, snap, tmp)
    fs.delete(new Path(tmp, ManifestName), false)
    DirSwap.promote(fs, root, tmp)
  }
}
