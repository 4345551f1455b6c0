package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Grouped (multi-tenant) top-k contracts: the one-pass
  * (cluster, group) join is semantically a per-group filtered search
  * — pinned by composition against searchFiltered/searchCodesFiltered
  * at the SAME fill schedule — and exact per tenant at the
  * exhaustive probe.
  */
class GroupedTopKSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    .select(col("vec_id"), col("embedding"), col("label"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "label", "nid", "rk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSet

  test("grouped == union of per-group filtered searches (same schedule)") {
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 2)
    val postings = Ivf.assign(emb, "embedding", model)
    val qs = emb.where(col("vec_id") < 3)
    val groups = Seq(1, 4, 7)
    val grouped = Ivf.searchGrouped(postings, qs, "embedding", "vec_id",
      model, k = 5, groupCol = "label",
      groups = emb.where(col("label").isin(groups.map(Int.box): _*))
        .select(col("label")).distinct(),
      nprobe0 = 2)
    val byFilter = groups.map { g =>
      Ivf.searchFiltered(postings, qs, "embedding", "vec_id", model,
          k = 5, filter = col("label") === g, nprobe0 = 2)
        .withColumn("label", lit(g))
    }.reduce(_ unionByName _)
    assert(rows(grouped) == rows(byFilter),
      "one-pass grouped search must equal the per-group filtered composition")
  }

  test("codes-layout grouped == per-group filtered codes composition") {
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 2)
    val idx = java.nio.file.Files.createTempDirectory("grp_codes")
      .resolve("index").toString
    Ivf.writeIndexInt8(Ivf.assign(emb, "embedding", model), "embedding", idx)
    val index = Ivf.readIndex(spark, idx)
    val qs = emb.where(col("vec_id") < 3)
    val groups = Seq(0, 5)
    val grouped = Ivf.searchCodesGrouped(index, qs, "embedding", "vec_id",
      model, k = 5, groupCol = "label",
      groups = emb.where(col("label").isin(groups.map(Int.box): _*))
        .select(col("label")).distinct(),
      nprobe0 = 2)
    val byFilter = groups.map { g =>
      Ivf.searchCodesFiltered(index, qs, "embedding", "vec_id", model,
          k = 5, filter = col("label") === g, nprobe0 = 2)
        .withColumn("label", lit(g))
    }.reduce(_ unionByName _)
    assert(rows(grouped) == rows(byFilter))
  }

  test("exhaustive probe is exact per tenant (every group fills or is spent)") {
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 8, iters = 2)
    val postings = Ivf.assign(emb, "embedding", model)
    val qs = emb.where(col("vec_id") < 2)
    val got = Ivf.searchGrouped(postings, qs, "embedding", "vec_id",
      model, k = 5, groupCol = "label",
      groups = emb.select(col("label")).distinct(), nprobe0 = 8)
    // every (query, label) cell holds exactly min(k, |label postings
    // excluding self|) rows — nothing under-fills at the exhaustive
    // probe
    val sizes = got.groupBy("qid", "label").count().collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    val qids = qs.select("vec_id").collect().map(_.getLong(0))
    val labelCounts = emb.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val qLabel = emb.where(col("vec_id") < 2).select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (q <- qids; (l, n) <- labelCounts) {
      val avail = n - (if (qLabel(q) == l) 1 else 0)
      assert(sizes.getOrElse((q, l), 0L) == math.min(5L, avail),
        s"cell ($q, $l) must hold min(k, $avail) rows")
    }
  }
}
