package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DSIR importance selection contracts: fitted counts match hand
  * counts; the score kernel replays a hand-computed log ratio; fit
  * and selection are partition-invariant; selecting for an English
  * target actually surfaces English documents; Gumbel resampling is
  * deterministic per seed, seed-sensitive, and weight-biased; and the
  * codegen'd expression agrees with the kernel.
  */
class DsirSpec extends SparkTestBase {

  private def docsDf = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "en"),
      (1L, "spark join shuffle partition broadcast filter scan", "en"),
      (2L, "la rapida zorra marron salta sobre el perro", "es"),
      (3L, "der schnelle braune fuchs springt uber den hund", "de"),
      (4L, "spark shuffle join broadcast partition agg scan", "en"),
      (5L, "le renard brun rapide saute par dessus le chien", "fr"),
      (6L, "the lazy dog sleeps under the brown tree", "en"),
      (7L, "zorra perro marron salta rapida sobre", "es")
    ).toDF("doc_id", "text", "lang")
  }

  test("fitCounts matches hand-counted buckets and total") {
    import spark.implicits._
    val df = Seq((0L, "a b"), (1L, "a")).toDF("doc_id", "text")
    val (counts, total) = Dsir.fitCounts(df, "text", buckets = 16)
    // instances: doc0 unigrams a,b + bigram (a b); doc1 unigram a -> 4
    assert(total == 4L)
    val ha = graft.functions.ShingleHashes.fnv1a64("a")
    val bucketA = ((ha % 16) + 16) % 16
    assert(counts(bucketA.toInt) >= 2L) // "a" appears twice as unigram
    assert(counts.sum == total)
  }

  test("scoreKernel replays a hand-computed smoothed log ratio") {
    // one-bucket degenerate model: every instance lands in bucket 0,
    // so w(x) = ((tc+1)(M+B) / ((rc+1)(N+B)))^n exactly
    val m = new Dsir.DsirModel(1, Array(3L), 3L, Array(9L), 9L)
    val text = "x y" // 3 instances: x, y, (x y)
    val (n, fp) = Dsir.scoreKernel(text, m)
    assert(n == 3)
    // per instance: p/q = (4/4) / (10/10) = 1 -> logw = 0
    assert(fp == 0L)
    val m2 = new Dsir.DsirModel(1, Array(7L), 7L, Array(3L), 3L)
    val (_, fp2) = Dsir.scoreKernel(text, m2)
    // per instance: (8/8)/(4/4) = 1 again -> still 0 (self-normalized)
    assert(fp2 == 0L)
    // asymmetric: target 7 of 15 total vs raw 3 of 20 total
    val m3 = new Dsir.DsirModel(1, Array(7L), 15L, Array(3L), 20L)
    val (_, fp3) = Dsir.scoreKernel(text, m3)
    // per instance p/q = (8/16)/(4/21) = 21/8 -> logw = 3*log2(21/8)
    val expect = LmQuality.log2fix(BigInt(21).pow(3), BigInt(8).pow(3))
    assert(fp3 == expect)
  }

  test("featureless and empty text score (n=0 or neutral) without error") {
    val m = new Dsir.DsirModel(4, Array(1L, 0L, 0L, 0L), 1L,
      Array(2L, 0L, 0L, 0L), 2L)
    // "" tokenizes to one empty token: 1 unigram, 0 bigrams
    val (n, _) = Dsir.scoreKernel("", m)
    assert(n == 1)
  }

  test("fitSplit (fused single-scan) equals the two-pass fit") {
    val docs = docsDf
    val twoPass = Dsir.fit(docs.where(col("lang") === "en"), docs,
      "text", buckets = 64)
    val onePass = Dsir.fitSplit(docs, col("lang") === "en", "text",
      buckets = 64)
    assert(onePass.targetCounts.toSeq == twoPass.targetCounts.toSeq)
    assert(onePass.rawCounts.toSeq == twoPass.rawCounts.toSeq)
    assert(onePass.targetTotal == twoPass.targetTotal)
    assert(onePass.rawTotal == twoPass.rawTotal)
  }

  test("fit and selectTopK are partition-invariant") {
    val docs = docsDf
    val target = docs.where(col("lang") === "en")
    val m1 = Dsir.fit(target, docs, "text", buckets = 64)
    val m7 = Dsir.fit(target.repartition(7), docs.repartition(5),
      "text", buckets = 64)
    assert(m1.targetCounts.toSeq == m7.targetCounts.toSeq)
    assert(m1.rawCounts.toSeq == m7.rawCounts.toSeq)
    val s1 = Dsir.selectTopK(docs, "text", "doc_id", m1, 4)
      .select("doc", "logw_fp").collect().map(r => (r.getLong(0), r.getLong(1)))
    val s7 = Dsir.selectTopK(docs.repartition(7), "text", "doc_id", m7, 4)
      .select("doc", "logw_fp").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(s1.toSeq == s7.toSeq)
  }

  test("selecting for an English target surfaces English documents") {
    val docs = docsDf
    val m = Dsir.fit(docs.where(col("lang") === "en"), docs, "text",
      buckets = 64)
    val top = Dsir.selectTopK(docs, "text", "doc_id", m, 4)
      .collect().map(_.getLong(0)).toSet
    val enDocs = Set(0L, 1L, 4L, 6L)
    assert((top & enDocs).size >= 3,
      s"top-4 $top should be mostly English docs $enDocs")
  }

  test("resample: deterministic per seed, seed-sensitive, weight-biased") {
    val docs = docsDf
    val m = Dsir.fit(docs.where(col("lang") === "en"), docs, "text",
      buckets = 64)
    def pick(seed: Long) = Dsir.resample(docs, "text", "doc_id", m,
      k = 4, seed = seed).collect().map(_.getLong(0)).toSeq
    assert(pick(1L) == pick(1L))
    assert(pick(1L) == Dsir.resample(docs.repartition(7), "text",
      "doc_id", m, k = 4, seed = 1L).collect().map(_.getLong(0)).toSeq,
      "resample must be partition-invariant")
    val draws = (1L to 12L).map(pick)
    assert(draws.distinct.size > 1, "12 seeds should not all agree")
    // weight bias: English docs (positive logw) must dominate the
    // union of draws
    val enDocs = Set(0L, 1L, 4L, 6L)
    val picked = draws.flatten
    val enFrac = picked.count(enDocs).toDouble / picked.size
    assert(enFrac > 0.5, s"en fraction $enFrac should exceed uniform 0.5")
  }

  test("codegen'd expression agrees with the kernel") {
    import spark.implicits._
    val docs = docsDf
    val m = Dsir.fit(docs.where(col("lang") === "en"), docs, "text",
      buckets = 64)
    val viaCol = Dsir.weights(docs, "text", "doc_id", m)
      .orderBy(col("doc")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val viaKernel = docs.select(col("doc_id"), col("text")).collect()
      .map { r =>
        val (n, fp) = Dsir.scoreKernel(r.getString(1), m)
        (r.getLong(0), n, fp)
      }.sortBy(_._1)
    assert(viaCol.toSeq == viaKernel.toSeq)
  }
}
