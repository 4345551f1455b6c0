package graft.core

/** Registry of the scratch trees the gate queries build under
  * `java.io.tmpdir` (every index-lifecycle row constructs its layouts
  * in a fresh temp dir), so the bench harness can SWEEP them between
  * reps. Why this exists: repeated index-building rows leave their
  * whole trees behind — a 3-rep bench of a build-heavy row stacks
  * three full pairs plus snapshots into /tmp, and the dirty-page
  * writeback of rep N's debris taxes rep N+1's writes. The r13
  * capture showed it WITHIN one row: multivec_topk_restored read
  * [2.80, 4.51, 6.95] s monotone across back-to-back identical reps
  * (each rep = write pair + snapshot + append + restore), the same
  * /tmp-debris signature the round's capture-hygiene notes document
  * across suites. Queries register through [[dir]]; [[sweep]] runs
  * in the bench's between-reps cleanup window (never inside a timed
  * region) and in nothing else — Verify's returned frames still read
  * lazily from their trees after the query function returns, so only
  * a caller that has fully materialized the result may sweep.
  */
object Scratch {
  private val dirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  /** `Files.createTempDirectory` + registration for later [[sweep]]. */
  def dir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(p)
    p
  }

  /** Delete every registered tree. Only call once the frames built on
    * them are fully materialized (counted/collected/written).
    */
  def sweep(): Unit = {
    var p = dirs.poll()
    while (p != null) {
      deleteTree(p.toFile)
      p = dirs.poll()
    }
  }

  private def deleteTree(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(deleteTree)
    f.delete() // a failed delete leaves plain /tmp debris — harmless
  }
}
