package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Ivf.trainDistributed]] — the full-corpus Lloyd's train whose
  * fixed-point component sums make a DISTRIBUTED fold deterministic
  * (integer addition is order-independent; float accumulation is what
  * forced [[Ivf.train]] off its old distributed formulation). The
  * hand-replay case is an independent sequential reimplementation of
  * the documented algorithm, not a call back into the code under test.
  */
class IvfTrainDistributedSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def centroidBits(m: IvfModel): Seq[Seq[Int]] =
    m.centroids.toSeq.map(_.toSeq.map(java.lang.Float.floatToIntBits))

  test("distributed train is bit-identical across partitionings") {
    val a = Ivf.trainDistributed(emb.repartition(1), "embedding", "vec_id",
      nlist = 8, iters = 3)
    val b = Ivf.trainDistributed(emb.repartition(7), "embedding", "vec_id",
      nlist = 8, iters = 3)
    assert(centroidBits(a) == centroidBits(b))
  }

  test("one iteration replays the documented fixed-point fold (incl. empty-cluster keep)") {
    import spark.implicits._
    // rows 0 and 1 are identical: whichever of their two init
    // centroids ranks second by index attracts nothing (ties assign
    // to the smaller index) and must survive the iteration unchanged
    val rows = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.6f, 0.8f)))
    val got = Ivf.trainDistributed(rows.toDF("vec_id", "embedding"),
      "embedding", "vec_id", nlist = 3, iters = 1)

    // independent sequential replay of the documented algorithm
    def mix(x0: Long): Long = {
      var z = x0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val seed = 42L
    val init = rows.map { case (id, v) => (mix(id + seed), id, v) }
      .sortBy { case (h, id, _) => (h, id) }.take(3).map(_._3)
    def nearest(cents: Seq[Array[Float]], v: Array[Float]): Int =
      cents.zipWithIndex.map { case (c, i) =>
        (-c.zip(v).map { case (a, b) => a.toDouble * b.toDouble }.sum, i)
      }.min._2
    val F = Ivf.TrainFixedPointScale
    def fix(x: Float): Long = // Spark round(double): BigDecimal half-up
      java.math.BigDecimal.valueOf(x.toDouble * F)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val sums = Array.fill(init.length)(new Array[Long](2))
    val counts = new Array[Long](init.length)
    rows.foreach { case (_, v) =>
      val c = nearest(init, v)
      v.zipWithIndex.foreach { case (x, i) => sums(c)(i) += fix(x) }
      counts(c) += 1
    }
    val expected = init.zipWithIndex.map { case (old, c) =>
      if (counts(c) == 0) old
      else {
        val m = sums(c).map(s => (s.toDouble / F) / counts(c))
        val n = math.sqrt(m.map(x => x * x).sum)
        if (n == 0.0) old else m.map(x => (x / n).toFloat)
      }
    }
    assert(counts.contains(0L), "fixture must exercise the empty-cluster keep")
    assert(centroidBits(got) ==
      expected.map(_.toSeq.map(java.lang.Float.floatToIntBits)))
  }

  test("model invariants and recall on the embeddings table") {
    val model = Ivf.trainDistributed(emb, "embedding", "vec_id",
      nlist = 16, iters = 3)
    assert(model.nlist == 16)
    model.centroids.foreach { c =>
      val n = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"centroid norm $n")
    }
    val qs = emb.where(col("vec_id") < 10)
    val postings = Ivf.assign(emb, "embedding", model)
    val rec = Similarity.recallAtK(
        Similarity.bruteForceTopK(emb, qs, "embedding", "vec_id", k = 5),
        Ivf.search(postings, qs, "embedding", "vec_id", model, k = 5,
          nprobe = 4),
        k = 5)
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(rec >= 0.5, s"mean recall@5 $rec")
  }

  test("recluster(distributed) == trainDistributed on the union; flags are exclusive") {
    val half = emb.agg(max(col("vec_id"))).head().getLong(0) / 2
    val lo = emb.where(col("vec_id") <= half)
    val hi = emb.where(col("vec_id") > half)
    val stale = Ivf.train(lo, "embedding", "vec_id", nlist = 8, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("ivf_rec_d")
      .toString + "/index"
    Ivf.writeIndex(Ivf.assign(lo, "embedding", stale), path)
    Ivf.appendToIndex(hi, "embedding", stale, path)
    val fresh = Ivf.recluster(spark, path, "embedding", "vec_id",
      nlist = 8, iters = 2, distributed = true)
    val union = Ivf.trainDistributed(emb, "embedding", "vec_id",
      nlist = 8, iters = 2)
    assert(centroidBits(fresh) == centroidBits(union))
    // the rewritten layout serves exactly like a one-shot assign
    val qs = emb.where(col("vec_id") < 3)
    def rows(p: org.apache.spark.sql.DataFrame) =
      Ivf.search(p, qs, "embedding", "vec_id", fresh, k = 5, nprobe = 3)
        .select("qid", "nid", "rk").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sortBy(x => (x._1, x._3)).toSeq
    assert(rows(Ivf.readIndex(spark, path)) ==
      rows(Ivf.assign(emb, "embedding", fresh)))
    val ex = intercept[IllegalArgumentException] {
      Ivf.recluster(spark, path, "embedding", "vec_id", nlist = 8,
        hierarchical = true, distributed = true)
    }
    assert(ex.getMessage.contains("flat"))
  }

  test("hierarchical distributed train: bit-stable, descends, covers nlist") {
    val a = Ivf.trainHierarchicalDistributed(emb.repartition(1),
      "embedding", "vec_id", nlist = 16, iters = 2)
    val b = Ivf.trainHierarchicalDistributed(emb.repartition(5),
      "embedding", "vec_id", nlist = 16, iters = 2)
    assert(centroidBits(a) == centroidBits(b))
    assert(a.hierarchical, "must carry the descent structure")
    assert(a.l1.length == 4, "b1 = round(sqrt(16))")
    // final count in [b1, b1*kc] — the trainHierarchical contract
    assert(a.nlist >= 4 && a.nlist <= 16, s"nlist ${a.nlist}")
    // children partition the flat table
    assert(a.children.flatten.sorted.toSeq == (0 until a.nlist))
    // a search under it serves sane recall
    val qs = emb.where(col("vec_id") < 10)
    val postings = Ivf.assign(emb, "embedding", a)
    val rec = Similarity.recallAtK(
        Similarity.bruteForceTopK(emb, qs, "embedding", "vec_id", k = 5),
        Ivf.search(postings, qs, "embedding", "vec_id", a, k = 5,
          nprobe = 4),
        k = 5)
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(rec >= 0.4, s"mean recall@5 $rec")
  }

  test("semDedupDistributed: same kernel, full-corpus model, empty-graceful") {
    val out = Dedup.semDedupDistributed(emb, "embedding", "vec_id",
      threshold = 0.35)
    assert(out.count() == emb.count())
    // the keep flags are exactly semDedupPostings over the
    // distributed-trained assignment (the pair kernel is shared; only
    // the trainer differs)
    val model = Ivf.trainDistributed(emb, "embedding", "vec_id",
      nlist = 16, iters = 3)
    val want = Dedup.semDedupPostings(
      Ivf.assign(emb, "embedding", model), "embedding", "vec_id", 0.35)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cluster", "keep").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    assert(keyed(out) == keyed(want))
    // empty corpus returns the contract schema, not a trainer refusal
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Dedup.semDedupDistributed(empty, "embedding", "vec_id", 0.5)
      .count() == 0)
  }

  test("null and empty vectors train nothing — init and fold alike") {
    import spark.implicits._
    val clean = emb.limit(40).localCheckpoint(true)
    val mx = clean.agg(max(col("vec_id"))).head().getLong(0)
    val dirty = clean.unionByName(Seq(
        (mx + 1, null.asInstanceOf[Array[Float]]),
        (mx + 2, Array.empty[Float]),
        (mx + 3, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding"))
    // the dirty rows' splitmix hashes could rank inside the init head
    // — the init filter (and the fold's null/empty skips) must make
    // them invisible to training entirely
    val a = Ivf.trainDistributed(clean, "embedding", "vec_id",
      nlist = 8, iters = 2)
    val b = Ivf.trainDistributed(dirty, "embedding", "vec_id",
      nlist = 8, iters = 2)
    assert(centroidBits(a) == centroidBits(b))
  }

  test("refuses an empty corpus") {
    import spark.implicits._
    val e = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Ivf.trainDistributed(e, "embedding", "vec_id", nlist = 4)
    }
    assert(ex.getMessage.contains("empty"))
  }
}
