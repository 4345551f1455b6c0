package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** The file-move half of a segment merge, shared by every
  * partition-dir index layout in the family ([[graft.pipeline.Ivf]]
  * cluster= dirs, [[graft.pipeline.Bm25]] bucket= dirs,
  * [[graft.pipeline.NearDupIndex]]/[[graft.pipeline.PHashIndex]]
  * (band, kb) cells, [[graft.pipeline.DedupIndex]]/
  * [[graft.pipeline.EmbedDedupIndex]] buckets): absorb a source
  * layout into a destination by per-file renames that preserve each
  * file's partition directory — metadata-only on any FileSystem with
  * O(1) rename, zero index bytes rewritten.
  *
  * Crash safety is IDEMPOTENCE, not atomicity: each rename is atomic,
  * a crashed merge leaves every file in exactly one layout, and a
  * re-run moves the remainder (callers keep their merge guards — a
  * model sidecar, a schema check — alive until the move completes so
  * the re-run can still verify). Same-name collisions are only
  * possible between DISTINCT files (a rename leaves no copy behind to
  * re-move), so they are disambiguated with a src-derived prefix, not
  * clobbered.
  */
object SegmentMerge {

  /** Move every data file under `srcDir` into the same relative spot
    * under `dstDir`, recursing through partition directories.
    * `_SUCCESS` markers are skipped; `keepDir` filters which
    * TOP-LEVEL child directories participate (metadata sidecars like
    * `_model` stay behind for the caller to retire after the move).
    * No-op when `srcDir` is absent.
    */
  def moveTree(fs: FileSystem, srcDir: Path, dstDir: Path,
               keepDir: String => Boolean = _ => true): Unit = {
    if (!fs.exists(srcDir)) return
    val tag = f"m${srcDir.toString.hashCode & 0x7fffffff}%x"
    def walk(from: Path, to: Path): Unit = {
      fs.mkdirs(to)
      fs.listStatus(from).foreach { f =>
        val n = f.getPath.getName
        if (f.isDirectory) walk(f.getPath, new Path(to, n))
        else if (n != "_SUCCESS") {
          val plain = new Path(to, n)
          val target =
            if (fs.exists(plain)) new Path(to, s"$tag-$n") else plain
          require(fs.rename(f.getPath, target),
            s"merge rename failed: ${f.getPath} -> $target")
        }
      }
    }
    fs.listStatus(srcDir).foreach { f =>
      val n = f.getPath.getName
      if (f.isDirectory) {
        if (keepDir(n)) walk(f.getPath, new Path(dstDir, n))
      } else if (n != "_SUCCESS") {
        val plain = new Path(dstDir, n)
        val target =
          if (fs.exists(plain)) new Path(dstDir, s"$tag-$n") else plain
        require(fs.rename(f.getPath, target),
          s"merge rename failed: ${f.getPath} -> $target")
      }
    }
  }
}
