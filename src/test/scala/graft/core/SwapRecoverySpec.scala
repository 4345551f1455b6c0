package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The DirSwap contract holes the r10 review flagged: (1) the
  * empty-transform path must delete the stale parked copy BEFORE the
  * live layout (or a crash between the deletes lets recovery
  * resurrect rows a right-to-be-forgotten delete removed); (2) EVERY
  * serving read / append of a swapped layout runs the recovery
  * preamble — a crash between a swap's park and promote must not
  * leave the index unreadable (or worse, silently "empty") until an
  * unrelated maintenance pass happens to run.
  */
class SwapRecoverySpec extends SparkTestBase {

  private def fsOf(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("delete-everything rewrite leaves no resurrectable parked state") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("swap_res")
    val p = dir.resolve("layout").toString
    Seq((1L, 0), (2L, 1)).toDF("id", "b")
      .write.partitionBy("b").parquet(p)
    // simulate a stale parked copy from a crashed earlier promote
    val fs = fsOf(p)
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(p), fs,
      new org.apache.hadoop.fs.Path(p + "__old"), false,
      spark.sparkContext.hadoopConfiguration)
    // delete-everything transform: afterwards NEITHER the live layout
    // nor the parked copy may exist — recover must have nothing to
    // resurrect the deleted rows from
    ParquetCompact.rewrite(spark, p, Seq("b"),
      transform = df => df.where(lit(false)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(p)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(p + "__old")),
      "a surviving parked copy would let recovery resurrect deleted rows")
    DirSwap.recoverAt(spark, p) // and recovery indeed restores nothing
    assert(!fs.exists(new org.apache.hadoop.fs.Path(p)))
  }

  private def park(path: String): Unit = {
    val fs = fsOf(path)
    require(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__old")))
  }

  test("Ivf.readIndex / indexStats / append recover a mid-swap-parked layout") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val model = graft.pipeline.Ivf.train(emb, "embedding", "vec_id",
      nlist = 4, iters = 2)
    val idx = java.nio.file.Files.createTempDirectory("swap_ivf")
      .resolve("index").toString
    val half = emb.agg(max(col("vec_id"))).head().getLong(0) / 2
    graft.pipeline.Ivf.writeIndex(
      graft.pipeline.Ivf.assign(emb.where(col("vec_id") <= half),
        "embedding", model), idx)
    val builtCount = graft.pipeline.Ivf.readIndex(spark, idx).count()

    park(idx) // crash between a compaction swap's park and promote
    assert(graft.pipeline.Ivf.readIndex(spark, idx).count() == builtCount,
      "a serving read must restore the parked layout, not fail")

    park(idx)
    // the stats alarm must see the full layout, not "empty index"
    assert(graft.pipeline.Ivf.indexStats(spark, idx)
      .agg(sum(col("size"))).head().getLong(0) == builtCount)

    park(idx)
    // an append onto the parked state must restore it FIRST — an
    // increment-only fresh dir would orphan the parked corpus forever
    graft.pipeline.Ivf.appendToIndex(emb.where(col("vec_id") > half),
      "embedding", model, idx)
    assert(graft.pipeline.Ivf.readIndex(spark, idx).count() == emb.count())
    assert(!fsOf(idx).exists(new org.apache.hadoop.fs.Path(idx + "__old")))
  }

  test("Bm25.searchIndex recovers a mid-swap-parked stats sub-layout") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val idx = java.nio.file.Files.createTempDirectory("swap_bm25")
      .resolve("index").toString
    graft.pipeline.Bm25.writeIndex(spark, docs, "text", "doc_id", idx)
    val queries = Seq(0L -> "hash join")
    val want = graft.pipeline.Bm25.searchIndex(spark, idx, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // each sub-layout swaps independently; stats is the one every
    // search reads first (and the one whose absence NPEs loudest)
    park(s"$idx/stats")
    assert(graft.pipeline.Bm25.searchIndex(spark, idx, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == want)
    park(s"$idx/postings")
    assert(graft.pipeline.Bm25.searchIndex(spark, idx, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == want)
  }

  test("rewrite dropHidden sheds a retired sidecar atomically with the promote") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("swap_dh")
      .resolve("layout").toString
    Seq((0, 1L), (0, 2L), (1, 3L)).toDF("part", "id")
      .write.partitionBy("part").parquet(root)
    // two hidden sidecars: one the transform retires, one it keeps
    Seq((1L, 5L)).toDF("id", "latest_seq")
      .write.parquet(s"$root/_latest")
    Seq((9L, 9L)).toDF("a", "b").write.parquet(s"$root/_model")
    graft.core.ParquetCompact.rewrite(spark, root, Seq("part"),
      transform = identity, dropHidden = Set("_latest"))
    // the promoted copy never contained the retired sidecar — there
    // is no crash window between the swap and a separate delete —
    // while ordinary metadata still carries over
    assert(!java.nio.file.Files.exists(
      java.nio.file.Path.of(s"$root/_latest")),
      "dropHidden sidecar must not be carried into the promoted copy")
    assert(java.nio.file.Files.exists(
      java.nio.file.Path.of(s"$root/_model")),
      "other hidden metadata must still carry over")
    assert(spark.read.parquet(root).count() == 3)
  }

  test("DedupIndex.probe recovers a mid-swap-parked layout") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .limit(50)
    val idx = java.nio.file.Files.createTempDirectory("swap_ddx")
      .resolve("index").toString
    graft.pipeline.DedupIndex.writeIndex(spark, docs, "text", "doc_id", idx)
    park(idx)
    // probe the SAME texts under shifted ids: with the parked index
    // restored every keeper is the index's low original id; a probe
    // that saw an empty (or missing) index would either crash or
    // keep the shifted ids
    val probed = graft.pipeline.DedupIndex.probe(spark, idx,
      docs.withColumn("doc_id", col("doc_id") + 1000000L),
      "text", "doc_id")
    assert(probed.count() == docs.count())
    assert(probed.where(col("keep_id") >= 1000000L).count() == 0,
      "index keepers must come from the recovered parked layout")
    graft.core.Pinned.release(probed)
  }
}
