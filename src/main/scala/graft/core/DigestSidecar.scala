package graft.core

import org.apache.spark.sql.SparkSession

/** Tiny content-digest sidecar for persisted MODEL directories
  * (`_model`, `_pq`): one hidden `_digest` file holding the hex
  * SHA-256 of the model's canonical bytes, written by the same
  * saveModel that writes the parquet.
  *
  * WHY: every model equality check used to round-trip the persisted
  * parquet through a Spark job (read + collect ≈ 0.1-0.3 s of fixed
  * driver overhead) just to compare bytes the caller already holds —
  * and the serving-lifecycle guards added in r12-r15 run such checks
  * per merge (both sides!) and per quantized append, a measured
  * 1.3-1.7× creep on the merge/ingest-heavy bench rows. Digest
  * equality replaces the job with ONE small FS read; a layout saved
  * before digests (no sidecar) falls back to the full parquet
  * comparison, so the check NEVER weakens — it only gets cheaper.
  * SHA-256 collision odds (~2^-128 for these kB-scale payloads) are
  * far below any hardware-error floor; the digest is a cache of the
  * bit-for-bit comparison, not a relaxation of it.
  *
  * Spark's parquet reader ignores underscore-prefixed files, so the
  * sidecar rides INSIDE the model dir and every tree move/snapshot/
  * compaction swap that carries `_model` carries its digest with it.
  */
object DigestSidecar {

  private def p(dir: String) = new org.apache.hadoop.fs.Path(dir, "_digest")

  /** Write (overwrite) the digest sidecar inside `dir`. */
  def write(spark: SparkSession, dir: String, digest: String): Unit = {
    val fs = p(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p(dir), true)
    try out.write(digest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The persisted digest, or None for a pre-digest layout. */
  def read(spark: SparkSession, dir: String): Option[String] = {
    val path = p(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  /** A SHA-256 builder with fixed-width primitive feeds — every
    * digest must be a pure function of the VALUES (lengths included,
    * so concatenation ambiguity cannot alias two different models).
    */
  final class Builder {
    private val md = java.security.MessageDigest.getInstance("SHA-256")
    private val buf = java.nio.ByteBuffer.allocate(4)
    def i32(v: Int): this.type = {
      buf.rewind(); buf.putInt(v); md.update(buf.array()); this
    }
    def f32(v: Float): this.type = i32(java.lang.Float.floatToRawIntBits(v))
    def floats(a: Array[Float]): this.type = {
      i32(a.length); a.foreach(f32); this
    }
    def ints(a: Array[Int]): this.type = { i32(a.length); a.foreach(i32); this }
    def hex(): String = md.digest().map("%02x".format(_)).mkString
  }
}
