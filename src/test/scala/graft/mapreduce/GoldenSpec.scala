package graft.mapreduce

import graft.SparkTestBase
import graft.core.Wrap

/** Byte-for-byte parity against goldens produced by EXECUTING the
  * reference's own functions: tools/gen_mapreduce_golden.py extracts
  * the chunker, wrappers and the pad/group/map/reduce functions from
  * /root/reference/debgpt and runs them over the same fixture — all
  * four map/reduce mode combinations plus the 1-chunk short-circuit,
  * local and distributed execution.
  */
class GoldenSpec extends SparkTestBase {

  private lazy val golden: Map[String, String] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/mapreduce.json"), "UTF-8")
    val json = try src.mkString finally src.close()
    val df = spark.read.option("multiLine", "true")
      .json(spark.createDataset(Seq(json))(
        org.apache.spark.sql.Encoders.STRING))
    val row = df.head()
    df.schema.fieldNames.map(f => f -> Option(row.getAs[Any](f))
      .map(_.toString).orNull).toMap
  }

  private val chunkSize = 96L
  private val question = "what is in these files?"

  private def fixtureEntries: Seq[(String, String, String)] =
    (0 until 6).map { i =>
      val body = (0 until 5).map(j =>
        s"doc $i line $j " + "tok " * (3 + (i + j) % 4)).mkString("\n")
      (s"doc$i.txt", Wrap.FileChunk, body)
    }

  test("chunk count matches the reference chunker over the fixture") {
    val eng = new MapReduceEngine(LossyEchoFunctor(2), chunkSize)
    assert(eng.chunkEntries(fixtureEntries).length == golden("n_chunks").toDouble.toInt)
  }

  for {
    (cmap, mTag) <- Seq(false -> "B", true -> "C")
    (cred, rTag) <- Seq(false -> "B", true -> "C")
  } test(s"mode map=$mTag reduce=$rTag equals the reference byte-for-byte (local + distributed)") {
    import spark.implicits._
    val eng = new MapReduceEngine(LossyEchoFunctor(2), chunkSize, cmap, cred)
    val chunks = eng.chunkEntries(fixtureEntries)
    val want = golden(s"map${mTag}_red$rTag")
    assert(eng.runLocal(chunks, question) == want)
    assert(eng.run(spark, spark.createDataset(chunks).repartition(3), question) == want)
  }

  test("1-chunk short-circuit equals the reference wrapped chunk") {
    import spark.implicits._
    val eng = new MapReduceEngine(LossyEchoFunctor(2), 10000L)
    val chunks = eng.chunkEntries(Seq(("single.txt", Wrap.FileChunk,
      "only\nfour\nshort\nlines")))
    assert(chunks.length == 1)
    assert(eng.run(spark, spark.createDataset(chunks)) == golden("single_chunk"))
  }
}
