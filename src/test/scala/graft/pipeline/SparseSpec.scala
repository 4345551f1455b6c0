package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Sparse retrieval tier contracts beyond the oracle rows: the
  * served plan reads only the query dims' buckets (partition
  * pruning), scores are partition-invariant integers, empty queries
  * and empty corpora behave, the docFilter equals post-hoc brute
  * force over the filtered corpus, and weights match an independent
  * per-element reimplementation.
  */
class SparseSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "nid", "score", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4)).toSeq

  test("sparsify matches a driver-side per-element reimplementation") {
    val got = Sparse.sparsify(emb.where(col("vec_id") === 0L),
        "embedding", "vec_id")
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val vec = emb.where(col("vec_id") === 0L)
      .head().getAs[scala.collection.Seq[Float]]("embedding")
    val want = vec.zipWithIndex.collect {
      case (v, i) if v.toDouble >= 0.05 =>
        ((i + 1).toLong, math.round(v.toDouble * 10000))
    }.toSeq
    assert(got == want)
    assert(got.nonEmpty && got.size < vec.size, "must actually sparsify")
  }

  test("scan topK is partition-invariant and matches the served index") {
    val sp = Sparse.sparsify(emb, "embedding", "vec_id")
    val q = Sparse.sparsify(emb.where(col("vec_id") < 3), "embedding",
      "vec_id")
    val a = rows(Sparse.topK(sp, q, k = 5))
    val b = rows(Sparse.topK(sp.repartition(7), q, k = 5))
    assert(a == b && a.nonEmpty)
    val idx = java.nio.file.Files.createTempDirectory("sparse_srv")
      .resolve("index").toString
    Sparse.writeIndex(sp, idx)
    assert(rows(Sparse.searchIndex(spark, idx, q, k = 5)) == a)
  }

  test("searchIndex reads only the query dims' buckets") {
    val idx = java.nio.file.Files.createTempDirectory("sparse_prune")
      .resolve("index").toString
    Sparse.writeIndex(Sparse.sparsify(emb, "embedding", "vec_id"), idx)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      val qe = df.queryExecution
      qe.executedPlan.execute().count()
      qe.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.sum
    }
    val all = filesRead(spark.read.parquet(idx))
    // a single-dim query touches exactly one of the 16 dim-buckets
    val dims = Seq(1L)
    val pruned = filesRead(spark.read.parquet(idx)
      .where(col("dbk").isInCollection(dims.map(_ % Sparse.DimBuckets)) &&
        col("dim").isInCollection(dims)))
    assert(pruned < all, s"expected pruning: all=$all pruned=$pruned")
    import spark.implicits._
    // and the serving entry point itself returns the same candidates
    // as a scan restricted to that dim
    val q1 = Seq((999999L, 1L, 10000L)).toDF("doc", "dim", "w")
    val got = rows(Sparse.searchIndex(spark, idx, q1, k = 3))
    val want = rows(Sparse.topK(
      Sparse.sparsify(emb, "embedding", "vec_id"), q1, k = 3))
    assert(got == want && got.nonEmpty)
  }

  test("docFilter equals brute force over the pre-filtered corpus") {
    val idx = java.nio.file.Files.createTempDirectory("sparse_filter")
      .resolve("index").toString
    Sparse.writeIndex(Sparse.sparsify(emb, "embedding", "vec_id"), idx)
    val q = Sparse.sparsify(emb.where(col("vec_id") < 3), "embedding",
      "vec_id")
    val got = rows(Sparse.searchIndex(spark, idx, q, k = 5,
      docFilter = Some(col("doc") % 2 === 0)))
    val want = rows(Sparse.topK(
      Sparse.sparsify(emb.where(col("vec_id") % 2 === 0), "embedding",
        "vec_id"), q, k = 5))
    assert(got == want && got.nonEmpty)
    assert(got.forall(_._2 % 2 == 0))
  }

  test("empty queries and empty corpora return empty, not errors") {
    val idx = java.nio.file.Files.createTempDirectory("sparse_empty")
      .resolve("index").toString
    Sparse.writeIndex(Sparse.sparsify(emb, "embedding", "vec_id"), idx)
    import spark.implicits._
    val noQ = Seq.empty[(Long, Long, Long)].toDF("doc", "dim", "w")
    assert(Sparse.searchIndex(spark, idx, noQ, k = 5).isEmpty)
    // an all-below-tau corpus writes nothing; missing layout would be
    // an empty index for mergeInto
    val never = java.nio.file.Files.createTempDirectory("sparse_none")
      .resolve("index").toString
    Sparse.writeIndex(Sparse.sparsify(
      emb.limit(0), "embedding", "vec_id"), never)
    Sparse.mergeInto(spark, idx, never) // absent src: no-op
    val q = Sparse.sparsify(emb.where(col("vec_id") < 3), "embedding",
      "vec_id")
    assert(rows(Sparse.searchIndex(spark, idx, q, k = 5)).nonEmpty)
  }
}
