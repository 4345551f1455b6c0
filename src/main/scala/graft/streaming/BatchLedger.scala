package graft.streaming

import org.apache.spark.sql.SparkSession

/** Replay guard for foreachBatch index appends: Structured Streaming
  * re-invokes foreachBatch with the SAME batchId when a batch
  * completed but its commit wasn't acknowledged (checkpoint lag,
  * driver restart) — the documented contract is that the sink must
  * use batchId to deduplicate. A ledger marker under
  * `<indexPath>__ledger/<runId>/<batchId>` records completed appends,
  * so a replayed batch is a no-op instead of a double append.
  *
  * Markers are NAMESPACED BY RUN, not just batchId: batchIds are
  * per-checkpoint and restart from 0 whenever a stream starts with a
  * fresh checkpoint, while the ledger persists beside the long-lived
  * index — un-namespaced markers would make a SECOND ingest into the
  * same index silently skip every append (its batchId 0 matching the
  * first run's completed batch 0). `runId` must be a STABLE KEY OF
  * THE INGEST ITSELF (source identity + batching + content
  * fingerprint — [[Staging.runKey]]), NOT a per-process random value:
  * re-running an ingest after a crash starts a fresh scratch
  * checkpoint whose batchIds restart at 0, and under a random runId
  * the rerun would replay every batch into a fresh namespace,
  * double-appending everything the crashed run already committed.
  * Under the stable key the rerun reuses the crashed run's namespace,
  * so its completed batches skip and only the missing ones run — the
  * crash heals. (The id-range staging is deterministic, so batchId i
  * carries the same id range on every rerun of the same source.)
  *
  * Boundary (stated honestly): the marker is written AFTER the
  * append, so a crash MID-append leaves partial files without a
  * marker and the replay re-appends — the same
  * partial-write-then-redo window every non-transactional file sink
  * has; periodic compaction plus the additive-reader contract keep
  * the layout recoverable, and a crash between append and marker is
  * the only double-append case left.
  *
  * The ledger lives at the SIBLING path `<indexPath>__ledger`, not
  * inside the index: [[graft.core.ParquetCompact]] swaps the whole
  * index directory, and an in-index ledger would vanish with every
  * compaction — re-opening the replay window exactly when the stream
  * compacts mid-flight.
  */
private[graft] object BatchLedger {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def marker(indexPath: String, runId: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(s"${indexPath}__ledger/$runId/$batchId")

  /** True iff this run's batchId already completed against `indexPath`. */
  def done(spark: SparkSession, indexPath: String, runId: String,
           batchId: Long): Boolean =
    fs(spark, indexPath).exists(marker(indexPath, runId, batchId))

  /** Record a completed append (idempotent itself). */
  def mark(spark: SparkSession, indexPath: String, runId: String,
           batchId: Long): Unit = {
    val f = fs(spark, indexPath)
    val m = marker(indexPath, runId, batchId)
    f.mkdirs(m.getParent)
    val out = f.create(m, true)
    out.close()
  }

  /** Run `append` once per (indexPath, runId, batchId): skip if the
    * ledger already records it, mark after it completes.
    */
  def once(spark: SparkSession, indexPath: String, runId: String,
           batchId: Long)(append: => Unit): Unit =
    if (!done(spark, indexPath, runId, batchId)) {
      append
      mark(spark, indexPath, runId, batchId)
    }

  /** Delete every SAME-PIPELINE run namespace EXCEPT `keepRunId` —
    * the marker-store GC for a long-lived index (one marker file per
    * batch per run, unbounded otherwise). Scoped to the run key's
    * `<kind>-` prefix: several pipelines legitimately share one
    * index's ledger (the vector index takes ingest, erasure, and
    * correction streams), and an unscoped GC at one pipeline's open
    * would delete ANOTHER pipeline's crashed run's completed-batch
    * markers — its rerun would then double-append everything it had
    * already committed, exactly the failure the stable run key
    * exists to heal. Within one pipeline the GC stays safe under the
    * single-writer + stable-key contract: a crashed run's rerun
    * derives the SAME key (markers kept, crash heals), while a
    * different ingest (new content) keying a new namespace means no
    * older run of this pipeline resumes here — its markers are dead
    * weight.
    */
  def pruneOtherRuns(spark: SparkSession, indexPath: String,
                     keepRunId: String): Unit = {
    val prefix = keepRunId.substring(0, keepRunId.indexOf('-') + 1)
    val f = fs(spark, indexPath)
    val p = new org.apache.hadoop.fs.Path(s"${indexPath}__ledger")
    if (!f.exists(p)) return
    f.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory && n != keepRunId && prefix.nonEmpty &&
          n.startsWith(prefix))
        f.delete(st.getPath, true)
    }
  }

  /** The same run-namespace GC over an EXPLICIT marker directory —
    * for sibling per-run stores that follow the same
    * `<dir>/<runId>/...` layout (the watermarked-curation batch-max
    * store).
    */
  def pruneRunDir(spark: SparkSession, dir: String,
                  keepRunId: String): Unit = {
    val f = fs(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!f.exists(p)) return
    f.listStatus(p).foreach { st =>
      if (st.isDirectory && st.getPath.getName != keepRunId)
        f.delete(st.getPath, true)
    }
  }

  /** Open an ingest run against `indexPath` under a STABLE run key
    * ([[Staging.runKey]] — source identity + batching + content
    * fingerprint) and GC dead runs' markers. Because a crashed run's
    * rerun derives the same key, the GC keeps exactly the markers
    * that heal it; a different ingest (new content) gets a fresh
    * namespace and sheds the old one. ONE helper so the ingest entry
    * points can't drift apart on the contract or forget the GC.
    *
    * Boundary (stated honestly): the key fingerprints the source by
    * (count, min, max) of its id column — re-ingesting CHANGED
    * content under the SAME ids into the same index is
    * indistinguishable from a rerun and will skip; that path is
    * unsupported by the append-only contract anyway (modified docs
    * need the delete pass first, which also clears the ledger's
    * relevance).
    */
  def openRun(spark: SparkSession, indexPath: String,
              runKey: String): String = {
    pruneOtherRuns(spark, indexPath, runKey)
    runKey
  }

  /** [[openRun]] for INDEX-BUILDING ingests, with the guarded
    * layout's root stated explicitly (it may differ from the ledger
    * site — the hybrid's oplog ledger guards the paired `$root`).
    * When the layout is MISSING at open, every marker in the ledger
    * is stale — the appends they record are gone — so the whole
    * ledger is wiped: without this, rebuilding a deleted index from
    * the same source would find every batch "completed" and return
    * success over an empty layout. (A first-ever run wipes an absent
    * ledger: a no-op.) OPT-IN deliberately: monitor/output pipelines
    * (quarantine, drift, decontam) stay on the plain [[openRun]] —
    * their outputs may LEGITIMATELY not exist after a complete run
    * (a clean corpus appends nothing), so missing-output-means-
    * stale-markers does not hold for them and a wipe would replay
    * completed batches into double appends.
    */
  def openRunForIndex(spark: SparkSession, indexPath: String,
                      runKey: String, dataPath: String): String =
    openRunForIndex(spark, indexPath, runKey, Seq(dataPath))

  /** Multi-witness [[openRunForIndex]] for PAIRED layouts (hybrid:
    * bm25 + ivf under one oplog ledger): the markers are stale when
    * ANY guarded layout is missing — one vanished side means the
    * appends its markers record are gone, and skipping them would
    * return success over a half-empty pair. The witness paths must
    * actually witness the guarded DATA (e.g. `$root/bm25` and
    * `$root/ivf`), never an ancestor of the ledger itself — a ledger
    * inside the witnessed dir makes the check a tautology (stale
    * markers imply the dir exists) and the wipe can never fire.
    */
  def openRunForIndex(spark: SparkSession, indexPath: String,
                      runKey: String, dataPaths: Seq[String]): String = {
    val f = fs(spark, indexPath)
    if (dataPaths.exists(p => !f.exists(new org.apache.hadoop.fs.Path(p))))
      f.delete(new org.apache.hadoop.fs.Path(s"${indexPath}__ledger"), true)
    pruneOtherRuns(spark, indexPath, runKey)
    runKey
  }
}
