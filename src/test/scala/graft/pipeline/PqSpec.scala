package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Product quantization contracts: m-byte codes, ADC ≈ true dot on
  * quantizable data, recall dial, determinism, codegen parity.
  */
class PqSpec extends SparkTestBase {

  private lazy val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("codes are m bytes; training is deterministic") {
    val m1 = Pq.train(emb, "embedding", "vec_id", m = 8, ksub = 16)
    val m2 = Pq.train(emb, "embedding", "vec_id", m = 8, ksub = 16)
    assert(m1.codebooks.flatten.map(_.toSeq).toSeq ==
      m2.codebooks.flatten.map(_.toSeq).toSeq)
    val code = emb.limit(3).select(Pq.encode(col("embedding"), m1).as("c"))
      .collect().map(_.getAs[Array[Byte]]("c"))
    assert(code.forall(_.length == 8))
  }

  test("ADC dot equals the exact dot against reconstructed codewords") {
    val model = Pq.train(emb, "embedding", "vec_id", m = 8, ksub = 16)
    val rows = emb.orderBy("vec_id").limit(5)
      .select(col("embedding"), Pq.encode(col("embedding"), model).as("c"))
      .collect()
    val q = rows.head.getSeq[Float](0).toArray
    rows.foreach { r =>
      val codes = r.getAs[Array[Byte]]("c")
      // reconstruct the codeword vector and take the plain dot
      var want = 0.0
      var j = 0
      while (j < model.m) {
        val cent = model.codebooks(j)(codes(j) & 0xff)
        var i = 0
        while (i < model.dsub) {
          want += q(j * model.dsub + i).toDouble * cent(i).toDouble
          i += 1
        }
        j += 1
      }
      import spark.implicits._
      // compute via the expressions directly on a tiny frame
      val adc = Seq(1).toDF("one")
        .select(Pq.adcDot(
          typedLit(codes),
          Pq.lut(typedLit(q.toSeq), model), model.ksub).as("s"))
        .head().getDouble(0)
      assert(math.abs(adc - want) < 1e-9, s"ADC $adc vs reconstructed $want")
    }
  }

  test("PQ two-stage ANN: recall dial works, exhaustive oversample = brute force") {
    val queries = emb.where(col("vec_id") < 5)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = ids(Similarity.bruteForceTopK(emb, queries, "embedding",
      "vec_id", 5))
    val model = Pq.train(emb, "embedding", "vec_id", m = 8, ksub = 16)
    def recallAt(os: Int): Double = {
      val pq = ids(Pq.pqTopK(emb, queries, "embedding", "vec_id",
        k = 5, model, oversample = os))
      brute.intersect(pq).size.toDouble / brute.size
    }
    val low = recallAt(2)
    val high = recallAt(16)
    assert(low >= 0.2, s"PQ recall floor broken: $low")
    assert(high >= low && high >= 0.6, s"recall dial broken: $low -> $high")
    val full = ids(Pq.pqTopK(emb, queries, "embedding", "vec_id",
      k = 5, model, oversample = Int.MaxValue / 8))
    assert(full == brute)
  }

  test("codegen and interpreted encode/LUT agree bit-for-bit") {
    val model = Pq.train(emb, "embedding", "vec_id", m = 8, ksub = 16)
    def run() = emb.orderBy("vec_id").limit(10)
      .select(Pq.encode(col("embedding"), model).as("c"),
        Pq.lut(col("embedding"), model).as("t"))
      .collect().map(r => (r.getAs[Array[Byte]]("c").toSeq,
        r.getSeq[Double](1).map(java.lang.Double.doubleToLongBits)))
    val viaCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run().toSeq == viaCodegen.toSeq)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
