package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Keyset scroll + exact count over the persisted IVF layout: the
  * page walk visits the live filtered set exactly once in id order,
  * terminates with an empty page, and countIndex agrees with the
  * walk.
  */
class ScrollCountSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def buildMasked(): String = {
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 2)
    val idx = java.nio.file.Files.createTempDirectory("scroll_idx")
      .resolve("index").toString
    Ivf.writeIndexInt8(Ivf.assign(emb, "embedding", model), "embedding", idx)
    Ivf.tombstoneVectors(spark, idx,
      emb.where(col("vec_id") % 5 === 1).select(col("vec_id")), "vec_id")
    idx
  }

  test("the page walk covers the live filtered set exactly once, in order") {
    val idx = buildMasked()
    val filt = Some(col("vec_id") % 3 === 0)
    val want = emb.where(col("vec_id") % 3 === 0 && col("vec_id") % 5 =!= 1)
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted.toSeq
    var after: Option[Long] = None
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    var page = Ivf.scroll(spark, idx, "vec_id", after, 7, filt)
      .collect().map(_.getLong(0)).toSeq
    while (page.nonEmpty) {
      assert(page == page.sorted, "each page is id-ordered")
      seen ++= page
      after = Some(page.last)
      page = Ivf.scroll(spark, idx, "vec_id", after, 7, filt)
        .collect().map(_.getLong(0)).toSeq
    }
    assert(seen.toSeq == want && want.nonEmpty,
      "concatenated pages must equal the sorted live filtered ids")
  }

  test("countIndex agrees with the serving read under filter + mask") {
    val idx = buildMasked()
    val got = Ivf.countIndex(spark, idx, "vec_id",
      Some(col("vec_id") % 3 === 0)).head().getLong(0)
    val want = emb.where(col("vec_id") % 3 === 0 && col("vec_id") % 5 =!= 1)
      .count()
    assert(got == want && want > 0)
    assert(Ivf.countIndex(spark, idx, "vec_id").head().getLong(0) ==
      emb.where(col("vec_id") % 5 =!= 1).count())
  }

  test("scroll rejects a non-positive limit") {
    val idx = buildMasked()
    intercept[IllegalArgumentException] {
      Ivf.scroll(spark, idx, "vec_id", None, 0)
    }
  }

  private lazy val docs = spark.read.parquet(sf() + "/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("bm25 scroll walks distinct live docs in order; countDocs agrees " +
    "with serving, not with stale stats") {
    val idx = java.nio.file.Files.createTempDirectory("bm25_sc")
      .resolve("index").toString
    Bm25.writeIndex(spark, docs, "text", "doc_id", idx)
    Bm25.tombstoneDocs(spark, idx,
      docs.where(col("doc_id") % 5 === 1).select(col("doc_id")))
    val filt = Some(col("doc") % 3 === 0)
    val want = docs.where(col("doc_id") % 3 === 0 && col("doc_id") % 5 =!= 1)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq
    var after: Option[Long] = None
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    var page = Bm25.scroll(spark, idx, after, 7, filt)
      .collect().map(_.getLong(0)).toSeq
    while (page.nonEmpty) {
      assert(page == page.sorted && page.distinct == page,
        "each page is id-ordered and duplicate-free (a doc has many " +
          "postings rows)")
      seen ++= page
      after = Some(page.last)
      page = Bm25.scroll(spark, idx, after, 7, filt)
        .collect().map(_.getLong(0)).toSeq
    }
    assert(seen.toSeq == want && want.nonEmpty)
    // count reports the SERVED set (mask applied), not the stats
    // table's N (which keeps tombstoned mass until the fold)
    assert(Bm25.countDocs(spark, idx, filt).head().getLong(0) ==
      want.size.toLong)
    assert(Bm25.countDocs(spark, idx).head().getLong(0) ==
      docs.where(col("doc_id") % 5 =!= 1).count())
  }

  test("sparse countIndex: live distinct docs under filter + mask; " +
    "zero on a missing layout") {
    val idx = java.nio.file.Files.createTempDirectory("sparse_sc")
      .resolve("index").toString
    val sp = Sparse.sparsify(emb, "embedding", "vec_id")
    Sparse.writeIndex(sp, idx)
    Sparse.tombstoneDocs(spark, idx,
      emb.where(col("vec_id") % 5 === 1).select(col("vec_id")))
    val want = sp.select(col("doc")).distinct()
      .where(col("doc") % 3 === 0 && col("doc") % 5 =!= 1).count()
    assert(Sparse.countIndex(spark, idx,
      Some(col("doc") % 3 === 0)).head().getLong(0) == want && want > 0)
    assert(Sparse.countIndex(spark,
      idx + "_missing").head().getLong(0) == 0L)
  }
}
