package graft.embed

import graft.SparkTestBase

/** Ports the reference embedding invariants (tests/test_embeddings.py:
  * 31-49): shape (dim,), rows L2-norm ≈ 1, batch ≡ per-item.
  */
class EmbeddingSpec extends SparkTestBase {

  test("shape and unit norm") {
    val m = HashEmbedding(64)
    val v = m.embed("hello world")
    assert(v.length == 64)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("deterministic: same text → same vector; different text → different") {
    val m = HashEmbedding(32)
    assert(m.embed("abc").toSeq == m.embed("abc").toSeq)
    assert(m.embed("abc").toSeq != m.embed("abd").toSeq)
  }

  test("batchEmbed ≡ map(embed)") {
    val m = HashEmbedding(32)
    val texts = Seq("a", "bb", "ccc", "")
    assert(m.batchEmbed(texts).map(_.toSeq) == texts.map(m.embed(_).toSeq))
  }

  test("LengthEmbedding matches the reference FakeEmbedder") {
    assert(LengthEmbedding.embed("hello world").toSeq == Seq(11.0f))
  }

  test("embedColumn adds the vector column via mapPartitions batches") {
    import spark.implicits._
    val df = spark.createDataset(Seq(("a", "hello"), ("b", "spark")))
      .toDF("id", "text")
    val out = Embed.embedColumn(df, HashEmbedding(16), "text", "vector", batchSize = 1)
    val rows = out.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getSeq[Float](2) == HashEmbedding(16).embed("hello").toSeq)
  }
}
