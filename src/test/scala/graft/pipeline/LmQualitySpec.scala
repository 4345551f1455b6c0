package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The LM quality filter's contracts: log2fix is an exact, monotone
  * floor-approximation of log2; training counts match hand counts;
  * in-domain text scores lower cross-entropy than OOV gibberish; and
  * the codegen'd expression agrees with interpreted eval.
  */
class LmQualitySpec extends SparkTestBase {

  test("log2fix: exact on powers of two, within 2^-20 below true log2") {
    assert(LmQuality.log2fix(BigInt(8), BigInt(1)) == (3L << 20))
    assert(LmQuality.log2fix(BigInt(1), BigInt(1)) == 0L)
    val rnd = new scala.util.Random(99L)
    (0 until 200).foreach { _ =>
      val a = BigInt(rnd.nextInt(1 << 20)) + 2
      val b = BigInt(rnd.nextInt(a.toInt - 1)) + 1
      val fix = LmQuality.log2fix(a, b).toDouble / (1L << 20)
      val real = math.log(a.toDouble / b.toDouble) / math.log(2.0)
      assert(fix <= real + 1e-12, s"log2fix($a,$b) above true log2")
      assert(real - fix < 3e-6, s"log2fix($a,$b) off by ${real - fix}")
    }
  }

  test("training counts and scoring match a hand-built model") {
    import spark.implicits._
    val train = Seq((0L, "a b a b c"), (2L, "a b")).toDF("doc_id", "text")
    val lm = LmQuality.train(train, "text", "doc_id", vocabSize = 10)
    // unigrams: a=3, b=3, c=1 -> vocab ids by (count desc, token asc):
    // a=0, b=1, c=2; unk=3, V'=4
    assert(lm.vocab.get("a") == 0 && lm.vocab.get("b") == 1 && lm.vocab.get("c") == 2)
    // bigrams: (a,b)x2 in doc0 + 1 in doc2 = 3; (b,a)=1; (b,c)=1
    assert(lm.bigrams.get((0L << 32) | 1L) == 3L)
    assert(lm.bigrams.get((1L << 32) | 0L) == 1L)
    assert(lm.bigrams.get((1L << 32) | 2L) == 1L)
    // ctx: a starts 3 bigrams, b starts 2
    assert(lm.ctxCounts(0) == 3L && lm.ctxCounts(1) == 2L && lm.ctxCounts(2) == 0L)
    // score "a b": P(b|a) = (3+1)/(3+4) = 4/7 -> xent_fp = log2fix(7,4)
    val scored = LmQuality.crossEntropy(
        Seq((9L, "a b")).toDF("doc_id", "text"), "text", "doc_id", lm)
      .head()
    assert(scored.getAs[Int]("n_bigrams") == 1)
    assert(scored.getAs[Long]("xent_fp") == LmQuality.log2fix(BigInt(7), BigInt(4)))
  }

  test("in-domain text scores lower xent than OOV gibberish; short docs 0") {
    import spark.implicits._
    val train = (0L until 50L).map(i =>
      (i, "the cat sat on the mat and the dog ran to the cat")).toDF("doc_id", "text")
    val lm = LmQuality.train(train, "text", "doc_id", vocabSize = 100)
    val scored = LmQuality.crossEntropy(Seq(
        (1L, "the cat sat on the mat"),
        (2L, "zz qq ww ee rr tt yy"),
        (3L, "single")).toDF("doc_id", "text"), "text", "doc_id", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scored(1L) < scored(2L),
      s"in-domain ${scored(1L)} should beat gibberish ${scored(2L)}")
    assert(scored(3L) == 0.0)
  }

  test("perplexityBuckets: driver mirror, tie cohesion, empty totality") {
    import spark.implicits._
    val train = (0L until 40L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val lm = LmQuality.train(train, "text", "doc_id", vocabSize = 50)
    // mixed corpus: in-domain, shuffled, OOV, and sub-2-token docs
    val docs = ((0L until 30L).map(i => (i, "the quick brown fox")) ++
      (30L until 60L).map(i => (i, "fox the over dog quick")) ++
      (60L until 90L).map(i => (i, s"zzz$i qqq www")) ++
      Seq((90L, ""), (91L, "one"))).toDF("doc_id", "text")
    val out = LmQuality.perplexityBuckets(docs, "text", "doc_id", lm)
      .select("doc", "avg_fp", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // driver mirror of the exact rule: thresholds at rank
    // floor(p*(n-1)/100) over (avg_fp, doc), ties to the lower bucket
    val scores = out.map { case (d, a, _) => (a, d) }.sorted
    val n = scores.size
    def thAt(p: Int) = scores((p.toLong * (n - 1) / 100).toInt)._1
    val (t1, t2) = (thAt(33), thAt(66))
    out.foreach { case (d, a, b) =>
      val want = if (a <= t1) "head" else if (a <= t2) "middle" else "tail"
      assert(b == want, s"doc $d avg_fp=$a got $b want $want")
    }
    // equal scores never straddle buckets
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.size == 1)
    }
    // sub-2-token docs score 0 -> head
    assert(out.filter(r => r._1 >= 90L).forall(_._3 == "head"))
    // all three buckets are populated on this trimodal corpus
    assert(out.map(_._3).distinct.toSet == Set("head", "middle", "tail"))
    // empty corpus: empty output, schema intact, no throw
    val empty = LmQuality.perplexityBuckets(
      docs.where(col("doc_id") < 0), "text", "doc_id", lm)
    assert(empty.columns.contains("bucket") && empty.count() == 0)
  }

  test("codegen and interpreted eval agree bit-for-bit") {
    import spark.implicits._
    val train = Seq((0L, "x y z x y x")).toDF("doc_id", "text")
    val lm = LmQuality.train(train, "text", "doc_id", vocabSize = 5)
    val df = Seq((1L, "x y z"), (2L, "y x y"), (3L, "")).toDF("doc_id", "text")
    def run() = LmQuality.crossEntropy(df, "text", "doc_id", lm)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val viaCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run() == viaCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
