package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Split contracts: proportional assignment is deterministic,
  * partition-invariant, append-stable, and near-proportional;
  * stratified assignment hits the exact floor(cumF·n_s) quotas per
  * stratum, is partition-invariant, assigns every row exactly once,
  * and matches a local single-machine replay of the documented rule.
  */
class SplitSpec extends SparkTestBase {

  private def idsDf(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
      .toDF("doc_id", "grp")
  }

  private val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("assignSplits: deterministic, partition-invariant, proportional") {
    val df = idsDf(2000)
    def run(d: org.apache.spark.sql.DataFrame) =
      Split.assignSplits(d, "doc_id", fracs, seed = 7L)
        .groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val c1 = run(df)
    assert(c1 == run(df.repartition(13)))
    assert(c1.values.sum == 2000L)
    assert(math.abs(c1("train") - 1600L) < 100, s"train ${c1("train")}")
    assert(math.abs(c1("val") - 200L) < 60 && math.abs(c1("test") - 200L) < 60)
  }

  test("assignSplits is append-stable: new rows never move old ones") {
    val small = idsDf(500)
    val big = idsDf(800)
    def m(d: org.apache.spark.sql.DataFrame) =
      Split.assignSplits(d, "doc_id", fracs, seed = 7L)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val a = m(small)
    val b = m(big)
    assert(a.forall { case (id, s) => b(id) == s })
  }

  test("assignSplits rejects bad fraction specs") {
    val df = idsDf(10)
    intercept[IllegalArgumentException] {
      Split.assignSplits(df, "doc_id", Seq("a" -> 0.5, "b" -> 0.4), 1L)
    }
    intercept[IllegalArgumentException] {
      Split.assignSplits(df, "doc_id", Seq("a" -> 0.5, "a" -> 0.5), 1L)
    }
  }

  test("splitStratified hits exact per-stratum quotas") {
    val df = idsDf(300) // 100 grp a, 200 grp b
    val out = Split.splitStratified(spark, df, "doc_id", "grp", fracs, 7L)
    val counts = out.groupBy("stratum", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // grp a: n=100 -> cuts floor(.8*100)=80, floor(.9*100)=90, 100
    assert(counts(("a", "train")) == 80L)
    assert(counts(("a", "val")) == 10L)
    assert(counts(("a", "test")) == 10L)
    // grp b: n=200 -> 160 / 20 / 20
    assert(counts(("b", "train")) == 160L)
    assert(counts(("b", "val")) == 20L)
    assert(counts(("b", "test")) == 20L)
    assert(out.count() == 300L && out.select("doc").distinct().count() == 300L)
  }

  test("splitStratified is partition-invariant and matches a local replay") {
    val df = idsDf(300)
    def run(d: org.apache.spark.sql.DataFrame, parts: Int) =
      Split.splitStratified(spark, d, "doc_id", "grp", fracs, 7L,
          numParts = parts)
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val s1 = run(df, 4)
    assert(s1 == run(df.repartition(11), 9))
    // local replay of the documented rule
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1)))
    val expect = rows.toSeq.groupBy(_._2).toSeq.flatMap { case (_, mem) =>
      val ranked = mem.map { case (id, _) =>
        (graft.functions.Splitmix64.unitUniform(id + 7L), id)
      }.sortBy(identity).map(_._2)
      val n = ranked.length
      val cuts = Seq(math.floor(0.8 * n).toLong,
        math.floor((0.8 + 0.1) * n).toLong, n.toLong)
      ranked.zipWithIndex.map { case (id, rk) =>
        val j = cuts.indexWhere(rk < _)
        id -> Seq("train", "val", "test")(j)
      }
    }.toMap
    assert(s1 == expect)
  }

  test("splitByContent: duplicates and Unicode variants share a split") {
    import spark.implicits._
    // three spellings of one doc (plain dup + decomposed variant) must
    // land together; distinct docs spread across splits
    val rows = (0 until 300).flatMap { i =>
      val t = s"caf\u00e9 document number $i with some text"
      Seq((i.toLong, t), (i + 1000L, t),
        (i + 2000L, t.replace("caf\u00e9", "cafe\u0301")))
    }
    val df = rows.toDF("doc_id", "text")
    val got = Split.splitByContent(df, "text", fracs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    (0 until 300).foreach { i =>
      assert(got(i.toLong) == got(i + 1000L) && got(i.toLong) == got(i + 2000L),
        s"variants of doc $i straddle splits")
    }
    val dist = got.filter(_._1 < 300).values.groupBy(identity)
      .map { case (k, v) => k -> v.size }
    // 300 uniform md5 buckets at 0.8/0.1/0.1 — loose proportional bands
    assert(dist("train") > 200 && dist.getOrElse("val", 0) > 5 &&
      dist.getOrElse("test", 0) > 5, dist.toString)
  }

  test("splitByContent: cut rule is floor(cumF·256) on the hex bucket; salt re-keys") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
    val got = Split.splitByContent(df, "text", fracs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    // driver replay of the documented rule
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 500).foreach { i =>
      val fp = md.digest(s"doc $i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 2)
      val want =
        if (fp < "cc") "train" else if (fp < "e6") "val" else "test"
      assert(got(i.toLong) == want, s"doc $i bucket $fp")
    }
    val salted = Split.splitByContent(df, "text", fracs, salt = "s1")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split"))
      .toMap
    assert(salted != got) // a salt re-keys the assignment
  }
}
