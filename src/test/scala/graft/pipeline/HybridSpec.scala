package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** RRF fusion contracts: the fused score replays the exact integer
  * mirror; a doc ranked by both lists beats single-list docs; k
  * bounds output; fusion is partition-invariant; and the e2e hybrid
  * path (BM25 + cosine) runs and favors the both-retrievers doc.
  */
class HybridSpec extends SparkTestBase {

  private def fp(rk: Int): Long = (1L << 20) / (60L + rk)

  test("rrfFuse replays the exact integer mirror") {
    import spark.implicits._
    val lex = Seq((0L, 10L, 1), (0L, 11L, 2), (0L, 12L, 3))
      .toDF("qid", "doc", "rk")
    val dense = Seq((0L, 11L, 1), (0L, 13L, 2))
      .toDF("qid", "doc", "rk")
    val out = Hybrid.rrfFuse(Seq(lex, dense), k = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3)))
    val expect = Seq(
      (11L, fp(2) + fp(1), 1), // in both lists
      (10L, fp(1), 2),
      (13L, fp(2), 3),
      (12L, fp(3), 4))
    assert(out.toSeq == expect)
  }

  test("ties break by doc id; k bounds the output") {
    import spark.implicits._
    val a = Seq((0L, 5L, 1), (0L, 9L, 1), (0L, 3L, 1)).toDF("qid", "doc", "rk")
    val out = Hybrid.rrfFuse(Seq(a), k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(out.toSeq == Seq((3L, 1), (5L, 2)))
  }

  test("fusion is partition-invariant") {
    import spark.implicits._
    val lex = (0L until 50L).map(i => (i % 3, i, (i / 3 + 1).toInt))
      .toDF("qid", "doc", "rk")
    val dense = (0L until 50L).map(i => (i % 3, (i * 7) % 50, (i / 3 + 1).toInt))
      .toDF("qid", "doc", "rk")
    def run(l: org.apache.spark.sql.DataFrame, d: org.apache.spark.sql.DataFrame) =
      Hybrid.rrfFuse(Seq(l, d), 5).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .sortBy(x => (x._1, x._4))
    assert(run(lex, dense).toSeq ==
      run(lex.repartition(7), dense.repartition(5)).toSeq)
  }

  test("e2e hybrid: the both-retrievers doc wins") {
    import spark.implicits._
    val docs = Seq(
      (0L, "hash join fast"), (1L, "merge sort"), (2L, "scan filter"))
      .toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val qv = Seq((0L, Array(1.0f, 0.05f))).toDF("qid", "vec")
    val out = Hybrid.hybridTopK(spark, docs, "text", "doc_id", emb,
        "vec_id", "embedding", Seq(0L -> "hash join"), qv,
        kCand = 3, k = 3)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    // doc 0 is BM25 rank 1 AND cosine rank 1 -> must fuse first
    assert(out.head == (0L, 1))
  }

  test("disk-served hybrid equals the scan-based fusion") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = Seq(0L -> "hash join", 1L -> "fast table scan")
    val qVecs = emb.where(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("vec"))
    val want = Hybrid.hybridTopK(spark, docs, "text", "doc_id", emb,
        "vec_id", "embedding", queries, qVecs, kCand = 20, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4)).toSeq
    val root = java.nio.file.Files.createTempDirectory("hyb_idx")
    val bmIdx = root.resolve("bm25").toString
    val ivfIdx = root.resolve("ivf").toString
    Bm25.writeIndex(spark, docs, "text", "doc_id", bmIdx)
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 16, iters = 3)
    Ivf.writeIndex(Ivf.assign(emb, "embedding", model), ivfIdx)
    val lexical = Bm25.searchIndex(spark, bmIdx, queries, k = 20)
      .select(col("qid"), col("doc"), col("rk"))
    // exhaustive probes (nprobe = nlist) make the IVF list exact; the
    // scan-based hybrid keeps self-hits, so the served one must too
    val dense = Ivf.search(Ivf.readIndex(spark, ivfIdx),
        emb.where(col("vec_id") < 2), "embedding", "vec_id", model,
        k = 20, nprobe = 16, excludeSelf = false)
      .select(col("qid"), col("nid").as("doc"), col("rk"))
    val got = Hybrid.rrfFuse(Seq(lexical, dense), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4)).toSeq
    assert(got == want)
  }
  test("paired lifecycle: appendDocs grows both sides exactly once; " +
      "a one-sided crash heals on retry; deleteDocs forgets decoys") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = Seq(0L -> "hash join", 1L -> "fast table scan")
    val qVecs = emb.where(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("vec"))
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 2)
    def serve(root: String) =
      Hybrid.searchIndex(spark, root, queries, qVecs, model, "embedding",
          "vec_id", kCand = 20, k = 10, nprobe = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3)))
        .sortBy(x => (x._1, x._4)).toSeq
    // one-shot over the full corpus = the truth every lifecycle must hit
    val rootW = java.nio.file.Files.createTempDirectory("hyb_w")
      .resolve("index").toString
    Hybrid.writeIndex(spark, docs, "text", "doc_id", emb, "vec_id",
      "embedding", model, rootW)
    // the quantizer sidecar round-trips: a restarted server recovers
    // the (layout, model) pair from the root alone
    val loaded = Hybrid.loadModel(spark, rootW)
    assert(loaded.centroids.length == model.centroids.length)
    assert(loaded.centroids.zip(model.centroids)
      .forall { case (a, b) => a.sameElements(b) })
    val want = serve(rootW)
    assert(want.nonEmpty)
    // grown: build on the low half, append the high half as batch 0;
    // a replay of the same batchId must be a no-op on BOTH sides
    val mid = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    val rootG = java.nio.file.Files.createTempDirectory("hyb_g")
      .resolve("index").toString
    Hybrid.writeIndex(spark, docs.where(col("doc_id") <= mid), "text",
      "doc_id", emb.where(col("vec_id") <= mid), "vec_id", "embedding",
      model, rootG)
    def appendHigh(): Unit = Hybrid.appendDocs(spark, rootG,
      docs.where(col("doc_id") > mid), "text", "doc_id",
      emb.where(col("vec_id") > mid), "vec_id", "embedding", model,
      runId = "runA", batchId = 0L)
    appendHigh()
    appendHigh() // replayed delivery: ledger-guarded no-op
    // one stats row per BM25 pass (build + exactly ONE append) —
    // checked before compaction collapses stats to its one-row sum
    assert(spark.read.parquet(s"$rootG/bm25/stats").count() == 2L)
    Hybrid.compactIndex(spark, rootG)
    assert(serve(rootG) == want)
    // crash healing: pre-mark the BM25 side as done for batch 1 (as
    // if the process died after the lexical append committed), then
    // drive batch 1 through the hybrid entry point — only the IVF
    // side appends, and the pair converges instead of skewing
    val rootC = java.nio.file.Files.createTempDirectory("hyb_c")
      .resolve("index").toString
    Hybrid.writeIndex(spark, docs, "text", "doc_id",
      emb.where(col("vec_id") <= mid), "vec_id", "embedding", model, rootC)
    graft.streaming.BatchLedger.mark(spark, s"$rootC/oplog",
      "runC/bm25-append", 1L)
    Hybrid.appendDocs(spark, rootC, docs.limit(0), "text", "doc_id",
      emb.where(col("vec_id") > mid), "vec_id", "embedding", model,
      runId = "runC", batchId = 1L)
    assert(serve(rootC) == want)
    // deletion drives both sides from one entry point
    val textDecoys = docs.select((col("doc_id") + 100000L).as("doc_id"),
      regexp_replace(col("text"), "[aeiou]", "9").as("text"))
    val vecDecoys = emb.where(col("vec_id") < 2)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val rootD = java.nio.file.Files.createTempDirectory("hyb_d")
      .resolve("index").toString
    Hybrid.writeIndex(spark, docs.unionByName(textDecoys), "text", "doc_id",
      emb.unionByName(vecDecoys), "vec_id", "embedding", model, rootD)
    assert(serve(rootD) != want, "decoys must skew the fused lists")
    Hybrid.deleteDocs(spark, rootD,
      textDecoys.select(col("doc_id").as("id"))
        .unionByName(vecDecoys.select(col("vec_id").as("id"))).distinct(),
      "vec_id")
    assert(serve(rootD) == want)
  }

  test("appendDocs persist-or-verifies the quantizer against the layout's own") {
    // regression (r10 ADVICE): a direct batch caller passing a
    // different quantizer than the one the layout was assigned under
    // would silently mis-assign every appended vector — ensurePair
    // must make it a loud error, with Hybrid.loadModel as the path
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val mid = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 2)
    val other = Ivf.train(emb, "embedding", "vec_id", nlist = 4, iters = 1)
    val root = java.nio.file.Files.createTempDirectory("hyb_ep")
      .resolve("index").toString
    Hybrid.writeIndex(spark, docs.where(col("doc_id") <= mid), "text",
      "doc_id", emb.where(col("vec_id") <= mid), "vec_id", "embedding",
      model, root)
    val e = intercept[IllegalArgumentException] {
      Hybrid.appendDocs(spark, root, docs.where(col("doc_id") > mid),
        "text", "doc_id", emb.where(col("vec_id") > mid), "vec_id",
        "embedding", other, runId = "runE", batchId = 0L)
    }
    assert(e.getMessage.contains("DIFFERENT coarse quantizer"))
    // and the supported path — the persisted pair — still appends
    Hybrid.appendDocs(spark, root, docs.where(col("doc_id") > mid),
      "text", "doc_id", emb.where(col("vec_id") > mid), "vec_id",
      "embedding", Hybrid.loadModel(spark, root), runId = "runE",
      batchId = 0L)
    assert(Ivf.readIndex(spark, s"$root/ivf").count() == emb.count())
  }

  test("filtered fused serve: both retrievers respect the predicate, lists stay filled") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 2)
    val root = java.nio.file.Files.createTempDirectory("hyb_filt")
      .resolve("index").toString
    Hybrid.writeIndex(spark, docs, "text", "doc_id", emb, "vec_id",
      "embedding", model, root)
    val qs = Seq(0L -> "hash join", 1L -> "fast table scan")
    val qv = emb.where(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("vec"))
    val fused = Hybrid.searchIndexFiltered(spark, root, qs, qv, model,
      "embedding", "vec_id", kCand = 10, k = 5, nprobe0 = 1,
      filter = _ % 2 === 0).collect()
    assert(fused.nonEmpty)
    // every fused doc respects the predicate
    assert(fused.forall(r => r.getAs[Long]("doc") % 2 == 0),
      "a fused doc escaped the filter")
    // the dense side widened rather than under-filling: each query
    // fuses a full k list (the even corpus is far larger than k)
    val perQ = fused.groupBy(_.getAs[Long]("qid")).view.mapValues(_.length)
    assert(perQ.values.forall(_ == 5), s"under-filled fusion: $perQ")
    // and the unfiltered serve DOES return odd docs — the predicate,
    // not the corpus, did the filtering above
    val unf = Hybrid.searchIndex(spark, root, qs, qv, model,
      "embedding", "vec_id", kCand = 10, k = 5, nprobe = 8).collect()
    assert(unf.exists(r => r.getAs[Long]("doc") % 2 == 1))
  }

  test("mergeInto absorbs a paired shard on both sides; a one-sided " +
      "crash heals on retry") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 2)
    val qs = Seq(0L -> "hash join", 1L -> "fast table scan")
    val qv = emb.where(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("vec"))
    def serve(root: String) =
      Hybrid.searchIndex(spark, root, qs, qv, model, "embedding",
          "vec_id", kCand = 20, k = 10, nprobe = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3)))
        .sortBy(x => (x._1, x._4)).toSeq
    val base = java.nio.file.Files.createTempDirectory("hyb_m")
    val one = base.resolve("one").toString
    Hybrid.writeIndex(spark, docs, "text", "doc_id", emb, "vec_id",
      "embedding", model, one)
    val want = serve(one)
    val mid = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
    def shardPair(a: String, b: String): Unit = {
      Hybrid.writeIndex(spark, docs.where(col("doc_id") <= mid), "text",
        "doc_id", emb.where(col("vec_id") <= mid), "vec_id", "embedding",
        model, a)
      Hybrid.writeIndex(spark, docs.where(col("doc_id") > mid), "text",
        "doc_id", emb.where(col("vec_id") > mid), "vec_id", "embedding",
        model, b)
    }
    val a = base.resolve("a").toString
    val b = base.resolve("b").toString
    shardPair(a, b)
    Hybrid.mergeInto(spark, a, b)
    assert(!java.nio.file.Files.exists(java.nio.file.Path.of(b)),
      "src root must be consumed wholesale")
    assert(serve(a) == want)
    // one-sided crash: the lexical sub-merge committed (src/bm25
    // consumed), the process died before the dense one — the retry
    // no-ops the consumed side and the pair converges
    val c = base.resolve("c").toString
    val dSrc = base.resolve("d").toString
    shardPair(c, dSrc)
    Bm25.mergeInto(spark, s"$c/bm25", s"$dSrc/bm25")
    Hybrid.mergeInto(spark, c, dSrc)
    assert(serve(c) == want)
  }

}
