package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Heavy-hitters contracts: the MG summary is exact at full capacity;
  * under-capacity it still CONTAINS every item above the N/(m+1)
  * bound (the containment guarantee, exercised across a shuffle-side
  * merge); the two-pass top-k equals a brute-force groupBy; and
  * results are partition-invariant.
  */
class HeavyHittersSpec extends SparkTestBase {

  private def corpus(rows: Seq[String]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("MG summary is exact when capacity >= distinct terms") {
    import spark.implicits._
    val df = corpus(Seq("a a b", "b a c"))
    val out = df.select(explode(split(col("text"), " ")).as("term"))
      .agg(graft.functions.MisraGries.misraGries(col("term"), 16).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.term"), col("e.weight"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("containment: every term above N/(m+1) survives under-capacity") {
    // 6 distinct terms, capacity 3; heavy terms x (12), y (9) out of
    // N = 30 instances: bound N/(m+1) = 7.5 -> x, y MUST survive any
    // partitioning / merge order
    val words = Seq.fill(12)("x") ++ Seq.fill(9)("y") ++
      Seq.fill(3)("p") ++ Seq.fill(3)("q") ++ Seq.fill(2)("r") ++
      Seq.fill(1)("s")
    import spark.implicits._
    for (parts <- Seq(1, 3, 8)) {
      val terms = words.toDF("term").repartition(parts)
      val kept = terms
        .agg(graft.functions.MisraGries.misraGries(col("term"), 3).as("s"))
        .select(explode(col("s")).as("e"))
        .select(col("e.term")).collect().map(_.getString(0)).toSet
      assert(kept.contains("x") && kept.contains("y"),
        s"parts=$parts kept=$kept must contain both heavy hitters")
      assert(kept.size <= 3)
    }
  }

  test("two-pass topTerms equals brute force and is partition-invariant") {
    val df = corpus(Seq(
      "k1 k1 k1 k2 k2 k3", "k1 k2 k4 k4 k5 k5", "k5 k5 k5 k6 k1 k2"))
    def brute(d: org.apache.spark.sql.DataFrame) =
      d.select(explode(split(col("text"), " ")).as("term"))
        .groupBy("term").count()
        .orderBy(col("count").desc, col("term")).limit(4)
        .collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = brute(df)
    for (parts <- Seq(1, 7)) {
      val got = HeavyHitters.topTerms(spark, df.repartition(parts),
          "text", k = 4, capacity = 64)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(got.toSeq == expect.toSeq, s"parts=$parts")
    }
  }

  test("streaming Complete-mode MG equals the batch counts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hh_stream")
    corpus(Seq("a a b c", "b a d", "d d d e"))
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    // summarize stages dir/documents.parquet itself; here the staged
    // copy IS a parquet dir, which the planner reads identically
    val got = graft.streaming.StreamingTopTerms
      .summarize(spark, dir.toString, capacity = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 2L, "c" -> 1L, "d" -> 4L, "e" -> 1L))
  }

  test("serialize/deserialize round-trips a partial buffer") {
    val agg = graft.functions.MisraGries(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 8)
    val buf = agg.createAggregationBuffer()
    buf.update("alpha", 5L); buf.update("beta", 2L)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }
}
