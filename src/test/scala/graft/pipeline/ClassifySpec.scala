package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** NB quality-classifier contracts: fitted counts and priors match
  * hand counts; the score kernel replays a hand-computed posterior
  * odds (prior included); featureless text scores the pure prior; fit
  * and selection are partition-invariant; the classifier separates
  * the classes it was trained on; and the codegen'd expression agrees
  * with the kernel.
  */
class ClassifySpec extends SparkTestBase {

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

  test("fit matches hand counts: class splits, priors, totals") {
    import spark.implicits._
    val df = Seq((0L, "a b", true), (1L, "a", false))
      .toDF("doc_id", "text", "lab")
    val m = Classify.fit(df, col("lab"), "text", buckets = 16)
    // doc0 (pos): unigrams a,b + bigram (a b) = 3; doc1 (neg): a = 1
    assert(m.posTotal == 3L && m.negTotal == 1L)
    assert(m.posDocs == 1L && m.negDocs == 1L)
    assert(m.posCounts.sum == 3L && m.negCounts.sum == 1L)
    val ha = graft.functions.ShingleHashes.fnv1a64("a")
    val bucketA = (((ha % 16) + 16) % 16).toInt
    assert(m.posCounts(bucketA) >= 1L && m.negCounts(bucketA) == 1L)
  }

  test("scoreKernel replays hand-computed posterior odds with prior") {
    // one-bucket degenerate model: every instance lands in bucket 0
    // pos: 3 instances over 4 docs; neg: 9 instances over 1 doc
    val m = new Classify.NbModel(1, Array(3L), 3L, Array(9L), 9L, 4L, 1L)
    val text = "x y" // 3 instances: x, y, (x y)
    val (n, fp) = Classify.scoreKernel(text, m)
    assert(n == 3)
    // per instance: p/q = (4/4)/(10/10) = 1; prior odds = 5/2
    val expect = LmQuality.log2fix(BigInt(5), BigInt(2))
    assert(fp == expect)
    // balanced priors + asymmetric conditionals:
    // pos 7 of 15, neg 3 of 20 -> per instance (8/16)/(4/21) = 21/8
    val m2 = new Classify.NbModel(1, Array(7L), 15L, Array(3L), 20L, 1L, 1L)
    val (_, fp2) = Classify.scoreKernel(text, m2)
    val expect2 = LmQuality.log2fix(BigInt(21).pow(3), BigInt(8).pow(3))
    assert(fp2 == expect2)
  }

  test("featureless-equivalent scoring degrades to the prior odds") {
    // n = 0 only for null-free zero-token input; the chunker contract
    // makes "" one empty token, so exercise the n=0 branch directly
    val m = new Classify.NbModel(4, Array(0L, 0L, 0L, 0L), 0L,
      Array(0L, 0L, 0L, 0L), 0L, 7L, 1L)
    // with no instances anywhere, every text's per-instance factor is
    // (0+1)/(0+1) · (0+4)/(0+4) = 1 -> score = prior odds = 8/2 = 4
    val (_, fp) = Classify.scoreKernel("z", m)
    assert(fp == 2L << LmQuality.FracBits,
      "log2(4) exactly in fixed point")
  }

  test("fit and selectTopK are partition-invariant") {
    val docs = docsDf
    val lab = col("lang").isin("en", "de")
    val m1 = Classify.fit(docs, lab, "text", buckets = 64)
    val m7 = Classify.fit(docs.repartition(7), lab, "text", buckets = 64)
    assert(m1.posCounts.toSeq == m7.posCounts.toSeq)
    assert(m1.negCounts.toSeq == m7.negCounts.toSeq)
    assert(m1.posDocs == m7.posDocs && m1.negDocs == m7.negDocs)
    val s1 = Classify.selectTopK(docs, "text", "doc_id", m1, 4)
      .select("doc", "logodds_fp").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val s7 = Classify.selectTopK(docs.repartition(7), "text", "doc_id",
        m7, 4)
      .select("doc", "logodds_fp").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(s1.toSeq == s7.toSeq)
  }

  test("classifier separates its training classes (Bayes decision)") {
    val docs = docsDf
    val lab = col("lang").isin("en", "de")
    val m = Classify.fit(docs, lab, "text", buckets = 64)
    val preds = Classify.predict(docs, "text", "doc_id", m)
      .select("doc", "pred").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    val posDocs = Set(0L, 1L, 3L, 4L, 6L)
    val correct = preds.count { case (d, p) => p == posDocs(d) }
    assert(correct >= 7, s"$correct/8 training docs correctly classified")
  }

  test("codegen'd expression agrees with the kernel") {
    val docs = docsDf
    val m = Classify.fit(docs, col("lang").isin("en", "de"), "text",
      buckets = 64)
    val viaCol = Classify.predict(docs, "text", "doc_id", m)
      .orderBy(col("doc")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val viaKernel = docs.select(col("doc_id"), col("text")).collect()
      .map { r =>
        val (n, fp) = Classify.scoreKernel(r.getString(1), m)
        (r.getLong(0), n, fp)
      }.sortBy(_._1)
    assert(viaCol.toSeq == viaKernel.toSeq)
  }
}
