package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The streaming race must equal the one-shot batch sample over the
  * accumulated corpus — heap merge is associative and order-free, so
  * batch boundaries cannot change the winners.
  */
class StreamingWeightedSampleSpec extends SparkTestBase {
  import spark.implicits._

  test("multi-batch streaming sample equals the batch cut") {
    val dir = java.nio.file.Files.createTempDirectory("sws")
    val docs = Seq(
      (1L, "a b c"), (2L, "d e"), (3L, "f g h i"), (4L, "j"),
      (5L, "k l m"), (6L, "n o p q r"), (7L, "s t"), (8L, "u v w x"),
      (9L, "y"), (10L, "z z z"))
      .toDF("doc_id", "text")
    // three part files → three micro-batches (maxFilesPerTrigger=1)
    docs.repartition(3).write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val got = StreamingWeightedSample.sample(spark, dir.toString,
        k = 4, seed = 42L)
      .orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val batch = graft.pipeline.Sample.weightedSample(
        docs.withColumn("w",
          graft.pipeline.TextAnalysis.tokenCount(col("text"))),
        "doc_id", "w", k = 4, seed = 42L)
      .orderBy("rk").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getInt(3))).toSeq
    assert(got == batch)
    assert(got.map(_._3) == Seq(1, 2, 3, 4))
  }
}
