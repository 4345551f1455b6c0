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
