package graft.functions

import graft.SparkTestBase
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Edge semantics of the vector expressions: nulls, length mismatch,
  * double-element arrays, type errors, codegen vs interpreted parity.
  */
class ExpressionEdgeSpec extends SparkTestBase {

  test("FixedVecSum packed buffer: null elements add nothing (row still " +
    "counts), short rows zero-pad, long rows truncate, empty and null " +
    "rows are skipped entirely") {
    import spark.implicits._
    val df = Seq(
      (0, Seq[java.lang.Long](1L, 2L, 3L)),
      (0, Seq[java.lang.Long](10L, null, 30L, 99L)), // null elem; len > dim
      (0, Seq[java.lang.Long](5L)),                  // short: zero-pads
      (0, Seq.empty[java.lang.Long]),                // empty: not counted
      (1, null.asInstanceOf[Seq[java.lang.Long]])    // null: not counted
    ).toDF("g", "lv")
    val out = df.groupBy(col("g"))
      .agg(FixedVecSum.fixedVecSum(col("lv"), 3).as("buf"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSeq).toMap
    // group 0: 3 counted rows; sums (1+10+5, 2+0+0, 3+30+0); the 99
    // beyond dim never lands
    assert(out(0) == Seq(3L, 16L, 2L, 33L), s"got ${out(0)}")
    assert(out(1) == Seq(0L, 0L, 0L, 0L), s"got ${out(1)}")
    val (n, sums) = FixedVecSum.decode(out(0), 3)
    assert(n == 3L && sums.toSeq == Seq(16L, 2L, 33L))
  }

  test("null inputs yield null, not errors") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f, 1.0f))),
      (Some(Seq(1.0f, 1.0f)), None)
    ).toDF("a", "b")
    val out = df.select(dotD(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  test("length mismatch uses the shorter prefix") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(10.0f, 20.0f))).toDF("a", "b")
    assert(df.select(dotD(col("a"), col("b"))).head().getDouble(0) == 50.0)
  }

  test("double-element arrays are accepted") {
    import spark.implicits._
    val df = Seq((Seq(3.0, 4.0), Seq(3.0, 4.0))).toDF("a", "b")
    assert(df.select(l2NormD(col("a"))).head().getDouble(0) == 5.0)
    assert(df.select(cosineSimD(col("a"), col("b"))).head().getDouble(0) == 1.0)
  }

  test("non-array input is an analysis-time type error") {
    import spark.implicits._
    val df = Seq(("abc", 1)).toDF("s", "i")
    intercept[org.apache.spark.sql.AnalysisException](
      df.select(l2NormD(col("s"))).collect())
  }

  test("interpreted eval matches codegen") {
    import spark.implicits._
    val df = Seq((Seq(0.1f, -0.2f, 0.3f), Seq(0.4f, 0.5f, -0.6f))).toDF("a", "b")
    val viaCodegen = df.select(cosineSimD(col("a"), col("b"))).head().getDouble(0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select(cosineSimD(col("a"), col("b"))).head().getDouble(0)
      assert(java.lang.Double.doubleToLongBits(viaCodegen) ==
        java.lang.Double.doubleToLongBits(interpreted))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("int8 cosine: exact integer kernel, zero-norm guard, codegen parity") {
    import spark.implicits._
    val df = Seq(
      (Array[Byte](127, 0, 0), Array[Byte](127, 0, 0)),   // identical
      (Array[Byte](1, 2, 3), Array[Byte](-1, -2, -3)),    // opposite
      (Array[Byte](0, 0, 0), Array[Byte](5, 5, 5))        // zero norm
    ).toDF("a", "b")
    val viaCodegen = df.select(int8CosineSim(col("a"), col("b"))).collect()
      .map(_.getDouble(0))
    assert(math.abs(viaCodegen(0) - 1.0) < 1e-12)
    assert(math.abs(viaCodegen(1) + 1.0) < 1e-12)
    assert(viaCodegen(2) == 0.0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select(int8CosineSim(col("a"), col("b"))).collect()
        .map(_.getDouble(0))
      assert(viaCodegen.zip(interpreted).forall { case (x, y) =>
        java.lang.Double.doubleToLongBits(x) == java.lang.Double.doubleToLongBits(y)
      })
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("int8 cosine: length mismatch yields NULL, codegen and interpreted") {
    import spark.implicits._
    val df = Seq(
      (Array[Byte](1, 2, 3), Array[Byte](1, 2)),     // corrupt/mixed-dim pair
      (Array[Byte](1, 2, 3), Array[Byte](1, 2, 3))   // control
    ).toDF("a", "b")
    val viaCodegen = df.select(int8CosineSim(col("a"), col("b"))).collect()
    assert(viaCodegen(0).isNullAt(0))
    assert(!viaCodegen(1).isNullAt(0))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select(int8CosineSim(col("a"), col("b"))).collect()
      assert(interpreted(0).isNullAt(0))
      assert(!interpreted(1).isNullAt(0))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("bloom_might_contain: no false negatives, null-safe, codegen parity") {
    import spark.implicits._
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    (0L until 50L).foreach(i => bloom.putLong(i * 7L))
    val df = Seq(Some(7L), Some(14L), Some(1000003L), None).toDF("h")
    val probe = graft.functions.HashFunctions.bloomMightContain(col("h"), bloom)
    val viaCodegen = df.select(probe.as("m")).collect()
    assert(viaCodegen(0).getBoolean(0) && viaCodegen(1).getBoolean(0))
    assert(viaCodegen(3).isNullAt(0))
    // inserted keys can NEVER read false (bloom contract)
    val inserted = (0L until 50L).map(_ * 7L).toDF("h")
    assert(inserted.select(probe.as("m")).collect().forall(_.getBoolean(0)))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select(probe.as("m")).collect()
      viaCodegen.zip(interpreted).foreach { case (c, i) =>
        assert(c.isNullAt(0) == i.isNullAt(0))
        if (!c.isNullAt(0)) assert(c.getBoolean(0) == i.getBoolean(0))
      }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("operator wrappers pin the pre-conversion NULL-text contract") {
    import spark.implicits._
    import graft.pipeline.{Dedup, TextAnalysis}
    val df = Seq((1L, null: String), (2L, "the cat sat on the mat")).toDF("id", "text")
    val got = df.select(
      Dedup.simhash64(col("text")).as("sh"),
      TextAnalysis.shingleHashes(col("text"), 3).as("hs"),
      TextAnalysis.langId(col("text")).as("lid")).orderBy(col("sh")).collect()
    val nullRow = got.find(_.getLong(0) == 0L).get
    assert(nullRow.getSeq[Long](1).isEmpty)            // no postings
    assert(nullRow.getStruct(2).getString(0) == "und") // und, not NULL
    assert(nullRow.getStruct(2).getDouble(1) == 0.0)
  }

  test("Mix.byWeight raises on a null id instead of silently dropping") {
    import spark.implicits._
    val df = Seq((Some(1L), "a"), (None, "a")).toDF("id", "lang")
    val ex = intercept[Exception](
      graft.pipeline.Mix.byWeight(df, "id", "lang", Map("a" -> 0.5)).count())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("Mix.byWeight")))
  }

  test("splitmix64 SQL surface accepts INT literal seeds") {
    GraftSql.register(spark)
    val got = spark.sql(
      "SELECT splitmix64(42L, 7) AS a, splitmix64(42L, 7L) AS b").head()
    assert(got.getLong(0) == got.getLong(1))
    assert(got.getLong(0) == Splitmix64.mix(49L))
  }

  test("race_key SQL surface matches the kernel; seed must be literal") {
    GraftSql.register(spark)
    val got = spark.sql(
      "SELECT race_key(7L, 3L) AS a, race_key(7L, 3L, 42) AS b, " +
        "race_key(7L, 3L, 42L) AS c").head()
    assert(got.getLong(0) == graft.pipeline.Sample.keyKernel(7L, 3L, 0L))
    assert(got.getLong(1) == graft.pipeline.Sample.keyKernel(7L, 3L, 42L))
    assert(got.getLong(1) == got.getLong(2))
    val ex = intercept[Exception](spark.sql(
      "SELECT race_key(7L, 3L, id) FROM range(1)").collect())
    assert(ex.getMessage.contains("literal"))
  }

  test("text-kernel SQL surface agrees with the Column API") {
    import spark.implicits._
    GraftSql.register(spark)
    Seq((1L, "the quick brown fox the quick brown fox"),
      (2L, "caf\u00e9 row"), (3L, "")).toDF("id", "text")
      .createOrReplaceTempView("sqlsurf")
    val got = spark.sql(
      """SELECT id, fingerprint(text) AS fp, normalized_fingerprint(text) AS nfp,
        |  simhash64(text) AS sh, lang_id(text) AS li,
        |  shingle_hashes(text, 3) AS shs,
        |  jaccard_sim(shingle_hashes(text, 3), shingle_hashes(text, 3)) AS js,
        |  mul_div_floor(7L, 3L, 2L) AS mdf
        |FROM sqlsurf ORDER BY id""".stripMargin).collect()
    val api = spark.table("sqlsurf")
      .select(col("id"),
        graft.pipeline.TextAnalysis.fingerprint(col("text")).as("fp"),
        graft.pipeline.TextAnalysis.normalizedFingerprint(col("text")).as("nfp"))
      .orderBy(col("id")).collect()
    got.zip(api).foreach { case (g, a) =>
      assert(g.getString(1) == a.getString(1), s"fingerprint id=${g.getLong(0)}")
      assert(g.getString(2) == a.getString(2), s"nfp id=${g.getLong(0)}")
    }
    // NFC: the DECOMPOSED spelling (e + combining acute) shares the
    // normalized fp with the composed row, while the plain
    // fingerprints differ
    val dec = spark.sql(
      "SELECT fingerprint('cafe\u0301 row') AS fp, " +
        "normalized_fingerprint('cafe\u0301 row') AS nfp").head()
    assert(got(1).getString(2) == dec.getString(1))
    assert(got(1).getString(1) != dec.getString(0))
    // identical shingle sets -> jaccard 1.0 (docs with >= w tokens)
    assert(got.head.getDouble(6) == 1.0)
    assert(got.head.getLong(7) == 10L) // floor(7*3/2)
    // arity errors are typed, not IndexOutOfBounds
    val ex = intercept[Exception](
      spark.sql("SELECT simhash64('a', 'b')").collect())
    assert(ex.getMessage.contains("expects 1 argument"))
  }

  test("GraftExtensions injects the SQL functions at session build") {
    import org.apache.spark.sql.SparkSession
    val orig = spark // force shared-session init (owns the SparkContext)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // a NEW session over the same context, with extensions applied
      // the cluster way (builder-time, no GraftSql.register call)
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      assert(s2 ne orig)
      val got = s2.sql(
        "SELECT cosine_sim_d(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS s, " +
          "dot_d(array(2.0F, 3.0F), array(4.0F, 5.0F)) AS d, " +
          "l2norm_d(array(3.0F, 4.0F)) AS n, " +
          "splitmix64(42L) AS h, splitmix64(42L, 7L) AS hs").head()
      assert(got.getDouble(0) == 1.0)
      assert(got.getDouble(1) == 23.0)
      assert(got.getDouble(2) == 5.0)
      assert(got.getLong(3) == Splitmix64.mix(42L))
      assert(got.getLong(4) == Splitmix64.mix(49L)) // seeded: mix(x + seed)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }

  test("gram_repetition: property vs brute-force counts on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // multibyte vocab on purpose: gram identity must be string-exact
    // for multilingual corpora, not byte- or ASCII-approximate
    val vocab = Array("a", "bb", "c", "dd", "e", "日本", "é", "🚀")
    def doc(): String =
      Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val docs = (0 until 200).map(i => (i.toLong, doc())).toDF("id", "text")
    def brute(text: String, n: Int): (Double, Double) = {
      val toks = text.split(" ", -1) // Spark split keeps trailing empties
      if (toks.length < n) return (0.0, 0.0)
      val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size)
      def r4(v: Double) = java.math.BigDecimal.valueOf(v)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      (r4(counts.values.max.toDouble / grams.size),
        r4(counts.values.filter(_ >= 2).sum.toDouble / grams.size))
    }
    val got = graft.pipeline.TextAnalysis
      .repetitionSignals(docs, "text", "id")
      .orderBy(col("doc")).collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val texts = docs.orderBy(col("id")).select("text").as[String].collect()
    texts.zip(got).foreach { case (t, (top, dup)) =>
      assert((brute(t, 2)._1, brute(t, 3)._2) == (top, dup),
        s"mismatch for: '$t'")
    }
  }

  test("jaccard_sim: property vs set math on random hash arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      def arr() = Array.fill(rnd.nextInt(20))(rnd.nextInt(12).toLong)
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(col("id"),
        graft.functions.HashFunctions.jaccardSim(col("a"), col("b")).as("j"))
      .orderBy(col("id")).collect().map(_.getDouble(1))
    rows.map { case (_, a, b) =>
      val (sa, sb) = (a.toSet, b.toSet)
      val u = sa.union(sb).size
      if (u == 0) 0.0 else sa.intersect(sb).size.toDouble / u
    }.zip(got).zipWithIndex.foreach { case ((want, g), i) =>
      assert(want == g, s"row $i: want $want got $g")
    }
  }
}
