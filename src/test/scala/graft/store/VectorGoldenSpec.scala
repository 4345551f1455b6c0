package graft.store

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Retrieval parity against goldens from the REFERENCE's own VectorDB
  * (tools/gen_vectordb_golden.py runs vectordb.py with the lz4 codec
  * stubbed): same float32 inputs inserted, same top-3 queries — the
  * (sim, source, text) triples must agree (sims to 1e-5: the
  * reference normalizes via numpy float32/float64 promotion, we
  * normalize in double; both store float32).
  */
class VectorGoldenSpec extends SparkTestBase {

  private lazy val golden = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/vectordb.json"), "UTF-8")
    val json = try src.mkString finally src.close()
    spark.read.option("multiLine", "true")
      .json(spark.createDataset(Seq(json))(
        org.apache.spark.sql.Encoders.STRING)).head()
  }

  private def vecMap(field: String): Map[String, Array[Float]] = {
    val row = golden.getAs[org.apache.spark.sql.Row](field)
    row.schema.fieldNames.map(n =>
      n -> row.getAs[Seq[Double]](n).map(_.toFloat).toArray).toMap
  }

  private def triples(field: String): Seq[(Double, String, String)] =
    golden.getAs[scala.collection.Seq[scala.collection.Seq[Any]]](field)
      .map(t => (t(0).toString.toDouble, t(1).toString, t(2).toString))
      .toSeq

  test("store retrieval reproduces the reference VectorDB top-3 triples") {
    import spark.implicits._
    val store = new VectorStore(spark,
      java.nio.file.Files.createTempDirectory("vg").toString + "/s", dim = 16)
    val inputs = vecMap("inputs")
    // reference insert order: vector_0..vector_9 then ones
    val ordered = (0 until 10).map(i => s"vector_$i") :+ "ones"
    store.add(spark.createDataset(ordered.map(n =>
      (n, if (n == "ones") "ones_text" else s"text_${n.stripPrefix("vector_")}",
        inputs(n)))).toDF("source", "text", "vector"))
    val queries = vecMap("queries")
    for (qname <- Seq("ones", "seed3", "seed99")) {
      val got = store.retrieve(queries(qname), topk = 3).collect()
      val want = triples(qname)
      assert(got.length == 3, qname)
      got.zip(want).foreach { case ((gs, gsrc, gtxt), (ws, wsrc, wtxt)) =>
        assert(gsrc == wsrc && gtxt == wtxt, s"$qname: $gsrc vs $wsrc")
        assert(math.abs(gs - ws) < 1e-5, s"$qname sim: $gs vs $ws")
      }
    }
  }
}
