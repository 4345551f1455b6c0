package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** BM25 contracts: the exact fixed-point score replays a hand-built
  * arithmetic mirror; rarer terms out-score common ones; results are
  * partition-invariant; k bounds the per-query rows; and the
  * MulDivFloor kernel survives the >2^63 product path.
  */
class Bm25Spec extends SparkTestBase {

  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, "hash join fast"),
      (1L, "hash hash hash table"),
      (2L, "merge sort slow"),
      (3L, "join scan join filter"),
      (4L, "table scan fast fast")
    ).toDF("doc_id", "text")
  }

  test("score replays the exact integer mirror") {
    val out = Bm25.topK(spark, corpus, "text", "doc_id",
        Seq(0L -> "hash join"), k = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    // mirror: N=5, T=3+4+3+4+4=18; df(hash)=2, df(join)=2
    val n = 5L; val t = 18L
    val idf = LmQuality.log2fix(BigInt(2 * n + 2), BigInt(2 * 2 + 1))
    def contrib(tf: Long, len: Long): Long =
      (BigInt(idf) * BigInt(22 * tf * t) /
        BigInt(10 * t * tf + 3 * t + 9 * len * n)).toLong
    val expect = Map(
      0L -> (contrib(1, 3) + contrib(1, 3)), // hash + join
      1L -> contrib(3, 4),                   // hash x3
      3L -> contrib(2, 4))                   // join x2
    assert(out == expect)
  }

  test("a rarer term out-scores a common one at equal tf and length") {
    import spark.implicits._
    val df = Seq(
      (0L, "rare pad pad"), (1L, "common pad pad"), (2L, "common x y"),
      (3L, "common y z"), (4L, "z q w")
    ).toDF("doc_id", "text")
    val out = Bm25.topK(spark, df, "text", "doc_id",
        Seq(0L -> "rare", 1L -> "common"), k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(0L) > out(1L),
      s"rare-term hit ${out(0L)} must out-score common-term hit ${out(1L)}")
  }

  test("partition-invariant and k-bounded") {
    val q = Seq(0L -> "hash join", 1L -> "fast table scan")
    val a = Bm25.topK(spark, corpus, "text", "doc_id", q, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).sortBy(x => (x._1, x._4))
    val b = Bm25.topK(spark, corpus.repartition(7), "text", "doc_id", q, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).sortBy(x => (x._1, x._4))
    assert(a.toSeq == b.toSeq)
    assert(a.count(_._1 == 0L) <= 2 && a.count(_._1 == 1L) <= 2)
    // ranks are 1-based and consecutive within a query
    assert(a.filter(_._1 == 0L).map(_._4).toSeq == (1 to a.count(_._1 == 0L)))
  }

  test("plan shape: broadcast dims, partial aggs, heap before the qid shuffle") {
    val plan = Bm25.topK(spark, corpus, "text", "doc_id",
        Seq(0L -> "hash join"), k = 2)
      .queryExecution.executedPlan.toString
    // idf and query-term dims must broadcast, never shuffle-join
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 2, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // the heap aggregate partials run before the qid exchange
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("persisted index search equals the direct scan path; buckets prune") {
    val idx = java.nio.file.Files.createTempDirectory("bm25spec")
      .resolve("index").toString
    Bm25.writeIndex(spark, corpus, "text", "doc_id", idx)
    val q = Seq(0L -> "hash join", 1L -> "merge")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4))
    assert(rows(Bm25.searchIndex(spark, idx, q, 3)).toSeq ==
      rows(Bm25.topK(spark, corpus, "text", "doc_id", q, 3)).toSeq)
    // partition pruning: a single-bucket filter must cut the files
    // the scan actually reads (numFiles metric, post-execution —
    // inputFiles ignores partition filters)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      val qe = df.queryExecution
      qe.executedPlan.execute().count()
      qe.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.sum
    }
    val all = filesRead(spark.read.parquet(s"$idx/postings"))
    val pruned = filesRead(spark.read.parquet(s"$idx/postings")
      .where(col("bucket").isInCollection(Seq(0L, 1L))))
    assert(pruned < all,
      s"bucket filter must cut files read: all=$all pruned=$pruned")
    // the bucket-aligned repartition before the dynamic-partition
    // write means ONE file per bucket directory per pass — not
    // (write tasks x buckets) small files
    val dirs = {
      val s = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$idx/postings"))
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith("bucket="))
        .toList
      finally s.close()
    }
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val s = java.nio.file.Files.list(d)
      val n = try s.filter(_.toString.endsWith(".parquet")).count()
        finally s.close()
      assert(n == 1L, s"expected 1 file per bucket dir after build, got $n in $d")
    }
  }

  test("query-term In filters page-prune within touched buckets") {
    import spark.implicits._
    // a vocabulary big enough that each bucket's postings span MANY
    // 512-row pages — page pruning can only skip whole pages, so the
    // pruned fraction approaches 1/pages-per-bucket (40k docs × ~7
    // distinct terms / 64 buckets ≈ 4.4k rows ≈ 9 pages per bucket)
    val big = (0L until 40000L)
      .map(i => (i, s"filler common words t${i}a t${i}b t${i}c t${i}d t${i}e"))
      .toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("bm25pp")
      .resolve("index").toString
    Bm25.writeIndex(spark, big, "text", "doc_id", idx)
    def scanned(df: org.apache.spark.sql.DataFrame): Long = {
      val qe = df.queryExecution
      qe.executedPlan.execute().count()
      qe.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum
    }
    // one rare term: its bucket holds ~1/64 of ~48k postings rows
    // (~750 rows over 2 pages); the term filter must cut the READ
    // well below the whole bucket thanks to the term-sorted pages
    val term = "t1234c"
    val bucket = Seq(term).toDF("term")
      .select(pmod(xxhash64(col("term")), lit(64L))).head().getLong(0)
    val bucketOnly = scanned(spark.read.parquet(s"$idx/postings")
      .where(col("bucket").isInCollection(Seq(bucket))))
    val termPruned = scanned(spark.read.parquet(s"$idx/postings")
      .where(col("bucket").isInCollection(Seq(bucket)) &&
        col("term").isInCollection(Seq(term))))
    assert(termPruned > 0 && termPruned < bucketOnly / 2,
      s"term filter not page-pruning: $termPruned of $bucketOnly bucket rows")
    // and the search itself still finds the document
    val hit = Bm25.searchIndex(spark, idx, Seq(0L -> term), 3)
      .select("doc").collect().map(_.getLong(0))
    assert(hit.contains(1234L), s"lost the match: ${hit.toSeq}")
  }

  test("append + compact: grown index equals one-shot; files drop") {
    import org.apache.spark.sql.functions.col
    val oneShot = java.nio.file.Files.createTempDirectory("bm25os")
      .resolve("index").toString
    val grown = java.nio.file.Files.createTempDirectory("bm25gr")
      .resolve("index").toString
    Bm25.writeIndex(spark, corpus, "text", "doc_id", oneShot)
    Bm25.writeIndex(spark, corpus.where(col("doc_id") <= 2), "text",
      "doc_id", grown)
    Bm25.appendToIndex(spark, corpus.where(col("doc_id") > 2), "text",
      "doc_id", grown)
    val q = Seq(0L -> "hash join", 1L -> "fast table scan")
    def rows(idx: String) = Bm25.searchIndex(spark, idx, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4)).toSeq
    assert(rows(grown) == rows(oneShot))
    def files(idx: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(idx))
      try s.filter(f => f.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    val before = files(grown)
    Bm25.compactIndex(spark, grown)
    assert(files(grown) < before, s"compaction must cut ${before} files")
    assert(rows(grown) == rows(oneShot), "compaction is contents-invariant")
  }

  test("MulDivFloor: long fast path and BigInt overflow path agree") {
    import graft.functions.MulDivFloor
    assert(MulDivFloor.evalExact(7L, 9L, 2L) == 31L)
    // a*b overflows a long: (2^40)·(2^40) / 2^50 = 2^30
    assert(MulDivFloor.evalExact(1L << 40, 1L << 40, 1L << 50) == (1L << 30))
    val big = Long.MaxValue / 2
    assert(MulDivFloor.evalExact(big, 4L, 8L) ==
      (BigInt(big) * 4 / 8).toLong)
    intercept[IllegalArgumentException] { MulDivFloor.evalExact(-1L, 1L, 1L) }
    intercept[IllegalArgumentException] { MulDivFloor.evalExact(1L, 1L, 0L) }
  }

  test("deleteDocs: search over the pruned index equals a fresh build") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val q = Seq(0L -> "hash join", 1L -> "merge")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(x => (x._1, x._4)).toSeq
    // delete REAL docs (every third), not just decoys: df and stats
    // must shrink to exactly the survivors' one-shot build
    val survivors = docs.where(col("doc_id") % 3 =!= 0)
    val idx = java.nio.file.Files.createTempDirectory("bm25_del_s")
      .resolve("index").toString
    Bm25.writeIndex(spark, docs, "text", "doc_id", idx)
    Bm25.deleteDocs(spark, idx,
      docs.where(col("doc_id") % 3 === 0).select(col("doc_id")))
    assert(rows(Bm25.searchIndex(spark, idx, q, 5)) ==
      rows(Bm25.topK(spark, survivors, "text", "doc_id", q, 5)))
    // deleting nothing is a no-op (beyond compaction)
    Bm25.deleteDocs(spark, idx, Seq.empty[Long].toDF("doc_id"))
    assert(rows(Bm25.searchIndex(spark, idx, q, 5)) ==
      rows(Bm25.topK(spark, survivors, "text", "doc_id", q, 5)))
  }
}
