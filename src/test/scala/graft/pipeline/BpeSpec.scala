package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE contracts: the merge loop replays the canonical Sennrich
  * worked example; encoding is consistent with training (a trained-on
  * word collapses, symbols always rebuild the word); the distributed
  * word-count fit equals the driver kernel; and the codegen'd count
  * expression agrees with the kernel.
  */
class BpeSpec extends SparkTestBase {

  // the worked example from Sennrich et al. 2016 §3.2
  private val sennrich = Map(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("trainFromCounts replays the Sennrich worked example") {
    val merges = Bpe.trainFromCounts(sennrich, numMerges = 4)
    // pair counts round 1: (e,s) = 6+3 = 9 wins (max; lexicographic
    // tie-break among 9s: (e,s) < (es,t) not yet formed)
    assert(merges.head == ((0, "e", "s", 9L)))
    assert(merges(1) == ((1, "es", "t", 9L)))
    assert(merges(2) == ((2, "est", "</w>", 9L)))
    // round 4: (l,o) = 5+2 = 7
    assert(merges(3) == ((3, "l", "o", 7L)))
  }

  test("min pair count stops the loop; empty vocab trains nothing") {
    assert(Bpe.trainFromCounts(Map("ab" -> 1L), numMerges = 10,
      minPairCount = 2L).isEmpty)
    assert(Bpe.trainFromCounts(Map.empty, numMerges = 5).isEmpty)
  }

  test("encoding collapses trained words and always rebuilds the word") {
    val m = new Bpe.BpeModel(
      Bpe.trainFromCounts(sennrich, numMerges = 10)
        .map(x => (x._2, x._3)).toArray)
    for (w <- sennrich.keys) {
      val enc = Bpe.encodeWord(w, m)
      assert(enc.mkString == w + Bpe.EndOfWord,
        s"symbols must rebuild '$w', got $enc")
      assert(enc.length < w.length + 1,
        s"trained word '$w' must compress below characters")
    }
    // unseen word with no learned pairs stays (mostly) characters
    val unseen = Bpe.encodeWord("zq", m)
    assert(unseen == Vector("z", "q", Bpe.EndOfWord))
  }

  test("distributed train equals the driver kernel on hand counts") {
    import spark.implicits._
    val df = Seq("low low newest", "newest widest low", "lower newest")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val viaSpark = Bpe.train(df, "text", numMerges = 6)
    val wc = Map("low" -> 3L, "newest" -> 3L, "widest" -> 1L,
      "lower" -> 1L)
    val viaKernel = Bpe.trainFromCounts(wc, 6).map(x => (x._2, x._3))
    assert(viaSpark.merges.toSeq == viaKernel)
  }

  test("trainCapped equals full train when the vocab fits the cap") {
    import spark.implicits._
    val df = Seq("low low newest", "newest widest low", "lower newest")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val full = Bpe.train(df, "text", numMerges = 6)
    val capped = Bpe.trainCapped(spark, df, "text", numMerges = 6,
      maxVocab = 16)
    assert(capped.merges.toSeq == full.merges.toSeq)
    // the table form exports the same merges with their pair counts
    val table = Bpe.trainCappedTable(spark, df, "text", numMerges = 6,
        maxVocab = 16).orderBy(col("rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(table == full.merges.toSeq)
  }

  test("a biting cap trains on the head words only") {
    import spark.implicits._
    // "ab" dominates; cap=1 must drop "xy" entirely, so no merge can
    // involve x or y even though the full vocab would merge them
    val df = Seq((0L, "ab ab ab xy xy")).toDF("doc_id", "text")
    val capped = Bpe.trainCappedTable(spark, df, "text", numMerges = 4,
        maxVocab = 1).orderBy(col("rank"))
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(capped.nonEmpty)
    assert(capped.forall { case (l, r, _) =>
      !(l + r).contains("x") && !(l + r).contains("y") })
    // counts are the TRUE counts of the head word (3× "ab")
    assert(capped.head == ("a", "b", 3L))
  }

  test("codegen'd count expression agrees with the kernel") {
    import spark.implicits._
    val df = Seq((0L, "low lower newest"), (1L, ""), (2L, "zq low"))
      .toDF("doc_id", "text")
    val m = new Bpe.BpeModel(
      Bpe.trainFromCounts(sennrich, 10).map(x => (x._2, x._3)).toArray)
    val viaCol = df.select(col("doc_id"),
        Bpe.bpeTokenCount(col("text"), m).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaKernel = df.collect()
      .map(r => r.getLong(0) -> Bpe.countKernel(r.getString(1), m)).toMap
    assert(viaCol == viaKernel)
  }
}
