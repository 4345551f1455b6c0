package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Unicode canonicalization contracts: NFC merges composed and
  * decomposed spellings, strip_accents removes marks from EITHER
  * spelling, ASCII passes through untouched, NULLs propagate, the
  * SQL surface matches the Column surface, and the normalized
  * fingerprint actually collapses byte-distinct spellings to one key.
  */
class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private val composed = "caf\u00e9 r\u00e9sum\u00e9"
  private val decomposed = "cafe\u0301 re\u0301sume\u0301"

  test("nfc merges composed and decomposed; idempotent; ASCII untouched") {
    val df = Seq((1L, composed), (2L, decomposed), (3L, "plain ascii"))
      .toDF("id", "s")
      .select(col("id"), NormalizeExpressions.nfcNormalize(col("s")).as("n"))
    val got = df.orderBy("id").collect().map(_.getString(1))
    assert(got(0) == composed)           // already NFC: unchanged
    assert(got(1) == composed)           // decomposed → composed
    assert(got(2) == "plain ascii")
    // idempotent
    val twice = df.select(NormalizeExpressions.nfcNormalize(col("n")).as("n2"))
      .collect().map(_.getString(0))
    assert(twice.toSeq == got.toSeq)
  }

  test("strip_accents removes marks from either spelling") {
    val df = Seq((1L, composed), (2L, decomposed), (3L, "no accents"))
      .toDF("id", "s")
      .select(col("id"), NormalizeExpressions.stripAccents(col("s")).as("n"))
    val got = df.orderBy("id").collect().map(_.getString(1))
    assert(got(0) == "cafe resume")
    assert(got(1) == "cafe resume")
    assert(got(2) == "no accents")
  }

  test("NULL propagates; SQL surface matches the Column surface") {
    GraftSql.register(spark)
    val r = spark.sql(
      s"SELECT nfc_normalize(CAST(NULL AS STRING)) AS a, " +
        s"nfc_normalize('$decomposed') AS b, " +
        s"strip_accents('$composed') AS c").head()
    assert(r.isNullAt(0))
    assert(r.getString(1) == composed)
    assert(r.getString(2) == "cafe resume")
    val ex = intercept[Exception](
      spark.sql("SELECT nfc_normalize('a', 'b')").collect())
    assert(ex.getMessage.contains("1 argument"))
  }

  test("normalizedFingerprint collapses byte-distinct spellings") {
    val df = Seq((1L, composed), (2L, decomposed)).toDF("doc_id", "text")
    val groups = graft.pipeline.Dedup.normalizedGroups(df, "text", "doc_id")
      .collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("keep_id") == 1L)
    assert(groups(0).getAs[Long]("n") == 2L)
    // plain fingerprint does NOT merge them — the NFC pass is load-bearing
    val plain = graft.pipeline.Dedup.exactGroups(df, "text", "doc_id").collect()
    assert(plain.length == 2)
  }

  test("expressions stay inside whole-stage codegen") {
    // a range source defeats ConvertToLocalRelation's constant fold,
    // so the expressions actually run in generated code
    val df = spark.range(4)
      .select(concat(lit(decomposed + " "), col("id").cast("string")).as("s"))
      .select(NormalizeExpressions.nfcNormalize(col("s")).as("n"),
        NormalizeExpressions.stripAccents(col("s")).as("m"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(1)` stage marker is the codegen span in the simple form
    assert(plan.contains("*(1) Project [nfc_normalize"), plan)
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq ==
      (0 until 4).map(i => composed + " " + i))
    assert(rows.map(_.getString(1)).toSeq ==
      (0 until 4).map(i => "cafe resume " + i))
  }
}
