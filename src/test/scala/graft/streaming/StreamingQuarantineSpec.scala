package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Quarantine-on-drift: drift decisions are identical to the
  * standalone monitor's on the same stream (the all-observed
  * baseline invariant), diverted batches never touch the kept
  * output or dedup index, and kept ∪ quarantined-batch docs
  * partition the corpus.
  */
class StreamingQuarantineSpec extends SparkTestBase {

  test("diverts exactly the monitor's alerted batches; kept side is curated") {
    val d = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val off = d.agg(max(col("doc_id"))).head().getLong(0) + 1
    val root = java.nio.file.Files.createTempDirectory("squar_s")
    val src = root.resolve("docs.parquet").toString
    val staged = d.unionByName(d.where(col("lang") === "en")
      .select((col("doc_id") + off).as("doc_id"), col("text"),
        col("lang"), col("source")))
    staged.write.parquet(src)

    // the standalone monitor's verdicts on the same stream
    val mon = root.resolve("monitor").toString
    StreamingDrift.ingest(spark, src, "doc_id", "lang", mon,
      nBatches = 4, alertTv = 0.3)
    val alerted = spark.read.parquet(mon).where(col("alert"))
      .select("batch_id").collect().map(_.getLong(0)).toSet
    assert(alerted.nonEmpty && !alerted.contains(0L))

    val idx = root.resolve("index").toString
    val out = root.resolve("kept").toString
    val qp = root.resolve("quarantine").toString
    StreamingQuarantine.ingest(spark, src, "doc_id", "text", "lang",
      _.withColumn("url", lit("https://ok.example.org/x")),
      blocklist = Nil, minQuality = 0.0, idx, out, qp,
      alertTv = 0.3, nBatches = 4)

    val quarantined = spark.read.parquet(qp)
      .collect().map(_.getLong(0)).toSet
    val kept = spark.read.parquet(out)
      .select(col("doc").as("doc_id")).collect().map(_.getLong(0)).toSet
    // no doc is both diverted and kept, and together the accepted
    // docs (deduped) + diverted docs account for the whole corpus
    assert(quarantined.intersect(kept).isEmpty)
    // quarantined = exactly the alerted batches' doc ids (replay the
    // id-range batching)
    val hi = staged.agg(max(col("doc_id"))).head().getLong(0)
    val span = math.max(1L, hi / 4 + 1L)
    val wantQuar = staged.collect().map(_.getLong(0))
      .filter(id => alerted.contains(math.min(3L, id / span))).toSet
    assert(quarantined == wantQuar)
    // the kept side came only from accepted batches
    assert(kept.nonEmpty && kept.subsetOf(
      staged.collect().map(_.getLong(0)).toSet -- quarantined))
  }
}
