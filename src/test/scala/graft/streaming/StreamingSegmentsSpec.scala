package graft.streaming

import graft.SparkTestBase
import graft.pipeline.Ivf
import org.apache.spark.sql.functions._

/** Segment-per-microbatch contracts: replay idempotence WITHOUT a
  * ledger (a rerun batch overwrites its own segment), the
  * empty-batch guard (no _SUCCESS-only segment roots), and the
  * fold-equivalence of mergeAll.
  */
class StreamingSegmentsSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def serveAll(root: String, model: graft.pipeline.IvfModel) =
    Ivf.searchCodes(
        Ivf.readSegmentsServing(spark,
          StreamingSegments.segmentRoots(spark, root), "vec_id", model),
        emb.where(col("vec_id") < 3), "embedding", "vec_id", model,
        k = 4, nprobe = 8)
      .select("qid", "nid", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("replayed batch is idempotent without a ledger") {
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 2)
    val root = java.nio.file.Files.createTempDirectory("ssegs_replay")
      .resolve("segments").toString
    val half = emb.agg(max(col("vec_id"))).head().getLong(0) / 2
    StreamingSegments.processBatch(spark,
      emb.where(col("vec_id") <= half), "embedding", root, model, 0L)
    StreamingSegments.processBatch(spark,
      emb.where(col("vec_id") > half), "embedding", root, model, 1L)
    val once = serveAll(root, model)
    // crash/replay: batch 1 delivered again — must overwrite its own
    // segment, not append a duplicate
    StreamingSegments.processBatch(spark,
      emb.where(col("vec_id") > half), "embedding", root, model, 1L)
    assert(StreamingSegments.segmentRoots(spark, root).size == 2)
    assert(serveAll(root, model) == once && once.nonEmpty)
  }

  test("empty batch creates no segment root") {
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 2)
    val root = java.nio.file.Files.createTempDirectory("ssegs_empty")
      .resolve("segments").toString
    StreamingSegments.processBatch(spark, emb.limit(0), "embedding",
      root, model, 0L)
    assert(StreamingSegments.segmentRoots(spark, root).isEmpty)
  }

  test("mergeAll folds every segment into one equivalent root") {
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 2)
    val root = java.nio.file.Files.createTempDirectory("ssegs_merge")
      .resolve("segments").toString
    val third = emb.agg(max(col("vec_id"))).head().getLong(0) / 3
    StreamingSegments.processBatch(spark,
      emb.where(col("vec_id") <= third), "embedding", root, model, 0L)
    StreamingSegments.processBatch(spark,
      emb.where(col("vec_id") > third && col("vec_id") <= 2 * third),
      "embedding", root, model, 1L)
    StreamingSegments.processBatch(spark,
      emb.where(col("vec_id") > 2 * third), "embedding", root, model, 2L)
    val before = serveAll(root, model)
    val dst = StreamingSegments.mergeAll(spark, root)
    assert(dst.isDefined)
    assert(StreamingSegments.segmentRoots(spark, root) == Seq(dst.get))
    assert(serveAll(root, model) == before && before.nonEmpty)
  }
}
