package graft.pipeline

import graft.SparkTestBase
import graft.functions.{HashFunctions, Splitmix64}
import org.apache.spark.sql.functions._

/** Corpus mixing, PII scrubbing, and the splitmix64 expression. */
class MixPiiSpec extends SparkTestBase {

  test("splitmix64 expression matches the scalar kernel, both codegen modes") {
    import spark.implicits._
    val keys = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 123456789L)
    val df = keys.toDF("k")
    val got = df.select(HashFunctions.splitmix64(col("k"))).collect().map(_.getLong(0))
    assert(got.toSeq == keys.map(Splitmix64.mix))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(HashFunctions.splitmix64(col("k"))).collect().map(_.getLong(0))
      assert(interp.toSeq == keys.map(Splitmix64.mix))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("unitUniform is the exact dyadic rational of the top 53 bits") {
    import spark.implicits._
    val keys = Seq(7L, 99L, 1234L)
    val got = keys.toDF("k").select(HashFunctions.unitUniform(col("k")))
      .collect().map(_.getDouble(0))
    val want = keys.map(Splitmix64.unitUniform)
    assert(got.toSeq == want)
    assert(got.forall(u => u >= 0.0 && u < 1.0))
  }

  private def mixInput() = {
    import spark.implicits._
    (0L until 400L).map(i =>
      (i, Seq("en", "zh", "fr", "de", "es")((i % 5).toInt))).toDF("id", "lang")
  }

  test("byWeight: drop, pass-through, downsample, upsample strata") {
    val weights = Map("en" -> 0.5, "zh" -> 2.25, "fr" -> 0.0, "de" -> 1.0)
    val out = Mix.byWeight(mixInput(), "id", "lang", weights,
      defaultWeight = 0.25, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    // exact per-row expectation from the same splitmix64 decision
    def copiesOf(id: Long, lang: String): Int = {
      val w = weights.getOrElse(lang, 0.25)
      val u = Splitmix64.unitUniform(id + 42L)
      math.floor(w).toInt + (if (u < w - math.floor(w)) 1 else 0)
    }
    val want = (0L until 400L).flatMap { i =>
      val lang = Seq("en", "zh", "fr", "de", "es")((i % 5).toInt)
      (0 until copiesOf(i, lang)).map(c => (i, lang, c.toLong))
    }
    assert(out.sorted.toSeq == want.sorted)

    // structural expectations
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!byLang.contains("fr"))                  // weight 0: dropped
    assert(byLang("de") == 80)                      // weight 1: exact pass
    assert(byLang("en") > 20 && byLang("en") < 60)  // ~0.5 of 80
    assert(byLang("zh") >= 160 && byLang("zh") <= 240) // 2-3 copies each
    // zh rows have copy indices 0..copies-1, always including 0 and 1
    val zhCopies = out.filter(_._2 == "zh").groupBy(_._1).view
      .mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(zhCopies.values.forall(cs => cs == (0L until cs.length).toSeq))
    assert(zhCopies.values.forall(cs => cs.length == 2 || cs.length == 3))
  }

  test("byTemperature: tau=1 is identity; tau=2 flattens toward uniform") {
    import spark.implicits._
    // head stratum a (300 rows) vs tail stratum b (30)
    val df = ((0L until 300L).map((_, "a")) ++ (300L until 330L).map((_, "b")))
      .toDF("doc_id", "lang")
    val id = Mix.byTemperature(df, "doc_id", "lang", tau = 1.0)
    assert(id.count() == 330L &&
      id.agg(max(col("copy"))).head().getLong(0) == 0L,
      "tau=1 must reproduce every row exactly once")
    val flat = Mix.byTemperature(df, "doc_id", "lang", tau = 2.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected: w_a < 1 (downsample head), w_b > 1 (upsample tail);
    // corpus size preserved in expectation
    assert(flat("a") < 300L, s"head must shrink, got ${flat("a")}")
    assert(flat("b") > 30L, s"tail must grow, got ${flat("b")}")
    val total = flat.values.sum
    assert(math.abs(total - 330L) < 40L,
      s"expected-size preservation, got $total")
  }

  test("byTemperature is deterministic and partition-invariant") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, if (i % 4 == 0) "x" else "y"))
      .toDF("doc_id", "lang")
    def run(d: org.apache.spark.sql.DataFrame) =
      Mix.byTemperature(d, "doc_id", "lang", tau = 2.0)
        .select("doc_id", "copy").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
    assert(run(df).toSeq == run(df.repartition(7)).toSeq)
  }

  test("byWeight: one stratum's weight never perturbs another's sample") {
    val base = Mix.byWeight(mixInput(), "id", "lang", Map("en" -> 0.5),
      defaultWeight = 1.0, seed = 7L)
      .where(col("lang") === "en").collect().map(_.getLong(0)).sorted
    val other = Mix.byWeight(mixInput(), "id", "lang",
      Map("en" -> 0.5, "zh" -> 3.0, "de" -> 0.1), defaultWeight = 1.0, seed = 7L)
      .where(col("lang") === "en").collect().map(_.getLong(0)).sorted
    assert(base.toSeq == other.toSeq)
  }

  test("shuffleOrder: splitmix64 order, stable across partitionings") {
    val in = mixInput()
    def run(parts: Int): Seq[(Long, Long)] =
      Mix.shuffleOrder(in.repartition(parts), "id", seed = 9L)
        .select("id", "skey").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val a = run(7)
    assert(a == run(2)) // partitioning-independent order
    val want = (0L until 400L).map(i => (i, Splitmix64.mix(i + 9L)))
      .sortBy { case (id, k) => (k, id) }
    assert(a == want)
    // epoch re-key: a different seed is a different permutation
    assert(Mix.shuffleOrder(in, "id", seed = 10L)
      .select("id").collect().map(_.getLong(0)).toSeq != a.map(_._1))
  }

  test("bloom-prefiltered decontamination equals the plain cross join") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val docs = (0L until 40L).map { i =>
      val t = if (i % 8 <= 1) base + s" epoch ${i / 8}"
              else s"unique content ${i} " + Seq.fill(10)(s"w${i}_%d").zipWithIndex
                .map { case (w, j) => w.format(j) }.mkString(" ")
      (i, t)
    }.toDF("doc_id", "text")
    val l = docs.where(col("doc_id") % 2 === 0)
    val r = docs.where(col("doc_id") % 2 === 1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => (x.getLong(0), x.getLong(1),
        java.lang.Double.doubleToLongBits(x.getDouble(2)))).toSet
    val plain = rows(Dedup.crossJaccardPairs(l, r, "text", "doc_id", 3, 0.1))
    val bloom = rows(Dedup.crossJaccardPairsBloom(l, r, "text", "doc_id", 3, 0.1))
    assert(bloom == plain)
    assert(plain.nonEmpty) // the planted near-dups actually collide
  }

  test("shingle-hash expression matches the reference fold, both codegen modes") {
    import spark.implicits._
    // reference reimplementation of the retired UDF's exact algorithm
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 1099511628211L }
      h
    }
    def ref(text: String, w: Int): Seq[Long] = {
      val toks = text.split(" ")
      if (toks.length < w) Seq.empty
      else (0 to toks.length - w).map { i =>
        var h = 0L
        (i until i + w).foreach { j => h = h * 1099511628211L + fnv(toks(j)) }
        h
      }
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a  b c",        // interior empty token (split keeps it)
      " leading space", // leading empty token
      "trailing space ", // trailing empties DROPPED by split
      "one two",        // fewer tokens than w
      "",               // single empty token
      "多字节 文本 here too", // multibyte UTF-8
      "x y z x y z x y z"
    )
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    def run(): Seq[(Long, Seq[Long])] =
      df.select(col("id"), TextAnalysis.shingleHashes(col("text"), 3).as("hs"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq.sortBy(_._1)
    val got = run()
    assert(got.map(_._2) == texts.map(ref(_, 3)))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(run().map(_._2) == texts.map(ref(_, 3)))
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("contamination fraction: planted overlap gives the exact share") {
    import spark.implicits._
    val train = Seq(
      (0L, "a b c d e"),             // shingles: abc bcd cde
      (2L, "x y z w")                // xyz yzw
    ).toDF("doc_id", "text")
    val eval = Seq(
      (1L, "a b c d q"),             // abc bcd cdq → 2/3 contaminated
      (3L, "p q r s"),               // pqr qrs → 0/2
      (5L, "x y z")                  // xyz → 1/1
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationFraction(train, eval, "text", "doc_id", 3)
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 2L, 2.0 / 3.0),
      (3L, 2L, 0L, 0.0),
      (5L, 1L, 1L, 1.0)))
  }

  test("pii scrub counts and redacts; idempotent on scrubbed text") {
    import spark.implicits._
    val df = Seq(
      (0L, "reach me at alice.smith+work@corp.example.org or bob@x.io thanks"),
      (1L, "server 192.168.0.1 talked to 10.0.0.255 on schedule"),
      (2L, "call +1-555-0134 (or +49-030-1234) and +1-555-123-4567"),
      (3L, "no pii here, just 3.14 and v1.2.3 and a@b (not an email)"),
      (4L, "mixed: c@d.com from 8.8.8.8 tel +1-555-9999")
    ).toDF("id", "text")
    val out = Pii.scrub(df, "text").orderBy("id")
      .select("n_emails", "n_ips", "n_phones", "scrubbed")
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 0L, 0L, 0L, 1L))
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 2L, 0L, 0L, 1L))
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 0L, 3L, 0L, 1L))
    assert(out(0).getString(3) ==
      "reach me at <EMAIL> or <EMAIL> thanks")
    assert(out(1).getString(3) == "server <IP> talked to <IP> on schedule")
    assert(out(2).getString(3) == "call <PHONE> (or <PHONE>) and <PHONE>")
    assert(out(3).getString(3) ==
      "no pii here, just 3.14 and v1.2.3 and a@b (not an email)")
    assert(out(4).getString(3) == "mixed: <EMAIL> from <IP> tel <PHONE>")
    // idempotence: a second scrub finds nothing
    val again = Pii.scrub(
      Pii.scrub(df, "text").select(col("id"), col("scrubbed").as("text")),
      "text")
    assert(again.agg(sum(col("n_emails") + col("n_ips") + col("n_phones")))
      .head().getLong(0) == 0L)
  }

  test("semDedup keeps the lowest id of every near-group (sf0.001)") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val out = Dedup.semDedup(emb, "embedding", "vec_id", threshold = 0.35)
      .select("vec_id", "cluster", "keep").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
    assert(out.length == emb.count())

    // brute-force driver recompute of the same rule
    val rows = emb.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val model = Ivf.train(emb, "embedding", "vec_id", nlist = 16, iters = 3)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        val x = a(i).toDouble; val y = b(i).toDouble
        d += x * y; nx += x * x; ny += y * y; i += 1
      }
      d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val byCluster = rows.groupBy { case (id, v) => model.nearest(v, 1)(0) }
    val wantDropped = byCluster.values.flatMap { mem =>
      mem.filter { case (id, v) =>
        mem.exists { case (id2, v2) => id2 < id && cos(v, v2) > 0.35 }
      }.map(_._1)
    }.toSet
    assert(out.filter(!_._3).map(_._1).toSet == wantDropped)
    // per cluster, the lowest id always survives
    val keptByCluster = out.groupBy(_._2)
    keptByCluster.values.foreach { mem =>
      assert(mem.minBy(_._1)._3, "lowest id in a cluster must be kept")
    }
  }
}
