package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Sanity + planted-duplicate oracles for the dedup/similarity
  * operators (the SQL-oracled paths are covered by the driver gate;
  * these cover the approximate paths on data with known near-dups).
  */
class PipelineSpec extends SparkTestBase {

  private def plantedDocs() = {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val nearDup = base.replace("today", "tonight") // 1-token change
    val other = "completely different content about spark query engines and columnar formats"
    spark.createDataset(Seq(
      (0L, base), (1L, nearDup), (2L, other),
      (3L, base), // exact dup of 0
      (4L, "unrelated short text here")
    )).toDF("doc_id", "text")
  }

  test("exact dedup keeps lowest id per fingerprint") {
    val survivors = Dedup.dropExactDups(plantedDocs(), "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(survivors.toSeq == Seq(0L, 1L, 2L, 4L))
  }

  test("jaccard pairs find the planted near-dup and the exact dup") {
    val pairs = Dedup.jaccardPairs(plantedDocs(), "text", "doc_id", w = 3, 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L))) // exact dup, jac = 1
    assert(pairs.contains((0L, 1L))) // near dup
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("jaccard df cap drops stop-shingle-only pairs, keeps real near-dups") {
    import spark.implicits._
    // docs 0..9 all share one boilerplate shingle ("common x y"); docs
    // 0 and 1 additionally share their real content.
    val docs = (0L to 9L).map { i =>
      val body = if (i <= 1) "alpha beta gamma delta" else s"u$i v$i w$i z$i"
      (i, s"common x y $body")
    }.toDF("doc_id", "text")
    val uncapped = Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.01)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 45) // every pair shares the boilerplate
    val capped = Dedup.jaccardPairs(docs, "text", "doc_id", 3, 0.01,
      maxShingleDf = 5)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(capped == Set((0L, 1L))) // only the real near-dup survives
  }

  test("minhash LSH surfaces the same planted pairs with verified jaccard") {
    val pairs = Dedup.minhashCandidatePairs(plantedDocs(), "text", "doc_id",
      w = 3, bands = 16, rows = 4, threshold = 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))
    assert(pairs.contains((0L, 1L)))
  }

  test("simhash: exact dup at distance 0; band join consistent with signatures") {
    val docs = plantedDocs()
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxDist = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Number](2).longValue)).toMap
    assert(pairs((0L, 3L)) == 0L)
    // signature-level ground truth: any pair within maxDist=3 MUST be
    // found (pigeonhole guarantee of the 4×16-bit banding)
    val sigs = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (a <- sigs.keys; b <- sigs.keys if a < b) {
      val dist = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      if (dist <= 3) assert(pairs.contains((a, b)), s"missed pair ($a,$b) dist=$dist")
    }
  }

  test("near-dup clustering: components converge to min label; representatives kept") {
    import spark.implicits._
    // chain 1-2-3, pair 5-6, plus an untouched doc 9
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("d1", "d2")
    val clusters = Dedup.nearDupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
    val docs = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("doc_id")
    val kept = Dedup.dropNearDups(docs, pairs, "doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 5L, 9L))
    // full pipeline: planted corpus → jaccard pairs → dedup
    val planted = plantedDocs()
    val jp = Dedup.jaccardPairs(planted, "text", "doc_id", 3, 0.5)
    val survivors = Dedup.dropNearDups(planted, jp, "doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(survivors.toSeq == Seq(0L, 2L, 4L)) // 1 and 3 fold into 0's cluster
  }

  test("score-aware representatives: best score wins, ties to min id") {
    import spark.implicits._
    // chain 1-2-3 (3 has the top score), pair 5-6 (tied score → min
    // id 5), untouched doc 9 survives regardless of its score
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("d1", "d2")
    val docs = Seq((1L, 10L), (2L, 30L), (3L, 50L), (5L, 20L),
      (6L, 20L), (9L, 1L)).toDF("doc_id", "quality")
    val kept = Dedup.dropNearDupsBy(docs, pairs, "doc_id", "quality")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(3L, 5L, 9L))
    // with a score that mirrors min-id (higher for smaller ids), the
    // score-aware rule degenerates to dropNearDups exactly
    val docsInv = docs.withColumn("inv", -col("doc_id"))
    val keptInv = Dedup.dropNearDupsBy(docsInv, pairs, "doc_id", "inv")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val keptMin = Dedup.dropNearDups(docs, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(keptInv.toSeq == keptMin.toSeq)
  }

  test("driver union-find and distributed propagation produce the same labels") {
    import spark.implicits._
    // random graph with chains, stars and singleton-joins
    val rnd = new scala.util.Random(7)
    val pairs = (0 until 400).map { _ =>
      val a = rnd.nextInt(120).toLong
      val b = a + 1 + rnd.nextInt(30)
      (a, b)
    }.distinct.toDF("d1", "d2")
    val fast = Dedup.nearDupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = Dedup.nearDupClusters(pairs, maxDriverEdges = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == loop)
  }

  test("LSH ANN recalls most brute-force neighbors on real embeddings") {
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.where(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, queries, "embedding", "vec_id", 5, dim = 64)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.2, s"LSH recall degenerate: $recall") // sanity floor
  }

  test("multimodal plumbing: features deterministic, frames sampled at spacing") {
    val media = Multimodal.synthetic(spark, 30)
    val feats = Multimodal.extractFeatures(media, featDim = 8)
    assert(feats.count() == 30)
    val f1 = feats.orderBy("id").select("features").collect()
      .map(_.getSeq[Float](0))
    val f2 = Multimodal.extractFeatures(media, featDim = 8)
      .orderBy("id").select("features").collect().map(_.getSeq[Float](0))
    assert(f1.toSeq == f2.toSeq)
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L)
    val perVideo = frames.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val durations = media.where(col("kind") === "video")
      .select("id", "durationMs").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    durations.foreach { case (id, dur) =>
      assert(perVideo(id) == (dur - 1) / 1000 + 1)
    }
  }

  test("langId picks a deterministic language with profile words present") {
    import spark.implicits._
    val docs = spark.createDataset(Seq(
      (0L, "the cat is on the mat and it is warm"),
      (1L, "der hund ist nicht auf der matte und das ist gut"),
      (2L, "xyzzy plugh qwertz"))).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      TextAnalysis.langId(col("text")).getField("_1").as("lang"))
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(out(0) == "en")
    assert(out(1) == "de")
    assert(out(2) == "und")
  }

  test("duplicate spans: planted repeat found, merged maximally, offsets exact") {
    import spark.implicits._
    // a 6-token phrase shared by docs 10 and 11 at known offsets; doc
    // 12 repeats a phrase WITHIN itself; doc 13 is unique; doc 14 is
    // shorter than the window
    val phrase = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (10L, s"one two three $phrase four five"),     // phrase at tok 3..8
      (11L, s"$phrase tail words here"),             // phrase at tok 0..5
      (12L, "x y rep1 rep2 rep3 rep4 mid1 mid2 rep1 rep2 rep3 rep4 z"),
      (13L, "entirely unique tokens without any duplication at all thanks"),
      (14L, "too short")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, "text", "doc_id", w = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // w=4 windows of the 6-token phrase: 3 consecutive windows merge
    // into one span covering exactly the phrase tokens
    assert(spans.contains((10L, 3, 9)), s"got $spans")
    assert(spans.contains((11L, 0, 6)), s"got $spans")
    // within-doc repeat: both occurrences of the 4-token run are spans
    assert(spans.contains((12L, 2, 6)) && spans.contains((12L, 8, 12)), s"got $spans")
    assert(!spans.exists(_._1 == 13L) && !spans.exists(_._1 == 14L))
    val stats = Dedup.duplicateWindowStats(docs, "text", "doc_id", w = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(stats(13L) == ((6L, 0L, 0.0))) // 9 tokens -> 6 windows, none dup
    assert(stats(14L) == ((0L, 0L, 0.0))) // shorter than w: no windows
    assert(stats(11L)._2 == 3L) // the 3 phrase windows
    assert(stats(12L)._2 == 2L) // one dup window per occurrence
  }

  test("span surgery removes duplicated tokens, keeps order, empties survive") {
    import spark.implicits._
    val phrase = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (10L, s"one two three $phrase four five"),
      (11L, s"$phrase tail words here"),
      (12L, phrase), // fully duplicated -> ""
      (13L, "entirely unique tokens without any duplication at all thanks")
    ).toDF("doc_id", "text")
    val got = Dedup.dropDuplicateSpans(docs, "text", "doc_id", w = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(10L) == "one two three four five")
    assert(got(11L) == "tail words here")
    assert(got(12L) == "")
    assert(got(13L) == "entirely unique tokens without any duplication at all thanks")
  }

  test("decontam span scrub excises only eval-matching spans") {
    import spark.implicits._
    val leaked = "alpha beta gamma delta epsilon zeta eta theta"
    val train = Seq(
      (1L, s"intro words here $leaked outro words"), // span inside
      (2L, leaked), // fully contaminated -> ""
      (3L, "a clean training document with no overlap whatsoever present"),
      // train-internal duplicate of doc 3: NOT eval-matching, so the
      // scrub (unlike dropDuplicateSpans) must leave both intact
      (4L, "a clean training document with no overlap whatsoever present")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, s"benchmark question: $leaked answer follows")
    ).toDF("doc_id", "text")
    val got = Dedup.decontamSpanScrub(train, eval, "text", "doc_id", w = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "intro words here outro words")
    assert(got(2L) == "")
    assert(got(3L) == "a clean training document with no overlap whatsoever present")
    assert(got(4L) == got(3L))
    // empty eval corpus: everything survives untouched
    val noEval = Dedup.decontamSpanScrub(train, eval.limit(0), "text",
      "doc_id", w = 4).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(noEval(1L).contains(leaked) && noEval(2L) == leaked)
  }

  test("duplicate spans match a string-based brute-force reference (random corpora)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val w = 3
    (0 until 3).foreach { trial =>
      val docs = (0 until 25).map { i =>
        val n = rnd.nextInt(20)
        (i.toLong, (0 until n).map(_ => s"w${rnd.nextInt(12)}").mkString(" "))
      }
      // reference on token STRINGS (independent of the hash kernel):
      // window occurrences counted corpus-wide, dup positions merged
      val winOf = docs.map { case (id, text) =>
        val toks = text.split(" ")
        id -> (if (toks.length < w || text.isEmpty) Array.empty[String]
               else toks.sliding(w).map(_.mkString("\u0000")).toArray)
      }.toMap
      val counts = winOf.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size }
      val want = winOf.toSeq.flatMap { case (id, wins) =>
        val dup = wins.zipWithIndex.collect {
          case (win, p) if counts(win) >= 2 => p
        }
        val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int)]
        var start = -1
        var prev = -1
        dup.foreach { p =>
          if (start < 0) { start = p; prev = p }
          else if (p - prev <= w) prev = p
          else { spans += ((id, start, prev + w)); start = p; prev = p }
        }
        if (start >= 0) spans += ((id, start, prev + w))
        spans
      }.toSet
      val got = Dedup.duplicateSpans(docs.toDF("doc_id", "text"), "text", "doc_id", w = w)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(got == want, s"trial $trial: $got vs $want")
    }
  }

  test("budgeted selection: exact prefix, partitioning-independent") {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, (1 to (3 + (i % 7)).toInt).map(k => s"t$k").mkString(" "),
        (100 - i).toDouble)) // score strictly decreasing with id
      .toDF("doc_id", "text", "score")
    def run(parts: Int) =
      Curation.selectByBudget(spark, docs, "score", "doc_id", "text",
          budget = 50L, numParts = parts)
        .collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
        .sortBy(_._1)
    val one = run(1)
    val seven = run(7)
    assert(one.toSeq == seven.toSeq) // range boundaries don't matter
    // reference: greedy prefix over ids (score order == id order here)
    var cum = 0L
    one.foreach { case (id, n, c, sel) =>
      cum += n
      assert(c == cum, s"cum mismatch at $id")
      assert(sel == (cum <= 50L), s"selection flag wrong at $id")
    }
    // the selection is a true prefix
    val flags = one.map(_._4)
    assert(flags.dropWhile(identity).forall(!_))
  }

  test("cross-corpus decontamination finds planted train/eval overlap only") {
    import spark.implicits._
    val train = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated training document about spark plans"),
      (4L, "another training doc sharing nothing with evaluation")
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"), // ≈ doc 0
      (3L, "an eval prompt with its own distinct content entirely")
    ).toDF("doc_id", "text")
    val got = Dedup.crossJaccardPairs(train, eval_, "text", "doc_id",
        w = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 1L))) // only the planted contamination
    // self-pairs impossible by construction: frames are disjoint sides
  }

  test("pipeline operators are total on EMPTY input frames") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.jaccardPairs(empty, "text", "doc_id", 3, 0.2, 128).count() == 0)
    assert(Dedup.jaccardPairsPrefix(empty, "text", "doc_id", 3, 0.5).count() == 0)
    assert(Dedup.minhashCandidatePairs(empty, "text", "doc_id").count() == 0)
    assert(Dedup.simhashPairs(empty, "text", "doc_id", 12).count() == 0)
    assert(TextAnalysis.repetitionSignals(empty, "text", "doc_id").count() == 0)
    assert(SeqPack.packOffsets(spark, empty, "text", "doc_id", 2048L).count() == 0)
    import spark.implicits._
    val one = Seq((1L, "a b c d")).toDF("doc_id", "text")
    assert(Dedup.crossJaccardPairs(empty, one, "text", "doc_id", 3, 0.2).count() == 0)
    assert(Dedup.crossJaccardPairs(one, empty, "text", "doc_id", 3, 0.2).count() == 0)
    // round-5 operators
    assert(Dedup.crossJaccardPairsBloom(empty, one, "text", "doc_id", 3, 0.2).count() == 0)
    assert(Dedup.crossJaccardPairsBloom(one, empty, "text", "doc_id", 3, 0.2).count() == 0)
    assert(Dedup.contaminationFraction(empty, one, "text", "doc_id", 3).count() == 1)
    assert(Dedup.contaminationFraction(one, empty, "text", "doc_id", 3).count() == 0)
    assert(Pii.scrub(empty, "text").count() == 0)
    assert(TextAnalysis.gopherFlags(empty, "text", "doc_id").count() == 0)
    assert(TextAnalysis.vocabulary(empty, "text", "doc_id").count() == 0)
    assert(TextAnalysis.tfidfTopTerms(empty, "text", "doc_id", 3).count() == 0)
    val emptyLang = Seq.empty[(Long, String)].toDF("doc_id", "lang")
    assert(Mix.byWeight(emptyLang, "doc_id", "lang", Map("en" -> 2.0)).count() == 0)
    assert(Mix.shuffleOrder(emptyLang, "doc_id").count() == 0)
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Dedup.semDedup(emptyEmb, "embedding", "vec_id", 0.5).count() == 0)
  }

  test("vocabulary and tf-idf top terms on a planted corpus") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spark spark shuffle join"),
      (1L, "spark join broadcast"),
      (2L, "bread flour water water")
    ).toDF("doc_id", "text")
    val full = TextAnalysis.vocabulary(docs, "text", "doc_id")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(full("spark") == (3L, 2L))   // tf 3 across docs, df 2
    assert(full("water") == (2L, 1L))
    assert(full("join") == (2L, 2L))
    // tf-idf: doc 0's top term must be "spark" (tf 2, df 2 → 3.0),
    // beating "shuffle" (tf 1, df 1 → 3.0) only via the term tiebreak?
    // No: spark scores 2*3/2 = 3.0, shuffle 1*3/1 = 3.0 — tie broken
    // by term asc → "shuffle" before "spark".
    val top = TextAnalysis.tfidfTopTerms(docs, "text", "doc_id", k = 2)
      .where(col("doc") === 0L).orderBy("rk")
      .collect().map(r => (r.getString(2), r.getDouble(5)))
    assert(top.length == 2)
    assert(top(0) == ("shuffle", 3.0) && top(1) == ("spark", 3.0))
    // scale shape: the per-term df side is an OPEN vocabulary (Heaps'
    // law at 100 TB) — it must never be broadcast unconditionally;
    // the tf⋈df join stays a plain equi-join and only AQE's runtime
    // size measurement may promote it
    val analyzed = TextAnalysis.tfidfTopTerms(docs, "text", "doc_id", k = 2)
      .queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"), analyzed)
  }

  test("gopher flags: each rule fires on its planted violation") {
    import spark.implicits._
    val good = ("the cat and the dog ran of to the house in town " * 3).trim
    val docs = Seq(
      (0L, good),                                       // passes all rules
      (1L, "the and of to in"),                         // too few words
      (2L, ("xx " * 40 + "the and of in to").trim),     // mean word len < 3
      (3L, (good.split(' ').map(w => "#" + w).mkString(" ") +
        " the and of")),                                // symbol ratio ≥ 0.1
      (4L, ("01 23 45 67 89 " * 8 + "the and of").trim), // alpha frac < 0.8
      (5L, ("lorem ipsum dolor sit amet " * 6).trim)    // < 2 stopwords
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherFlags(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(got.map(_.getBoolean(6)).toSeq ==
      Seq(true, false, false, false, false, false))
    // signals agree with a direct recompute on the good doc
    val ws = good.split(' ')
    assert(got(0).getLong(1) == ws.length)
    assert(got(0).getDouble(2) == ws.map(_.length).sum.toDouble / ws.length)
    assert(got(0).getLong(5) == 5L) // all five stopwords present
    // rule isolation: doc 5 fails ONLY the stopword rule
    assert(got(5).getLong(5) < 2L && got(5).getDouble(4) >= 0.8)
  }

  test("global line dedup: boilerplate drops, order survives, empty docs stay") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha\nBOILER\nbeta"),
      (2L, "BOILER\ngamma"),
      (3L, "BOILER\nBOILER")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dropDuplicatedLines(docs, "text", "doc_id")
      .orderBy("doc").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(
      (1L, "alpha\nbeta"),   // middle line removed, order kept
      (2L, "gamma"),
      (3L, "")))             // all-boilerplate doc present but empty
    // minCount above the repeat count keeps everything
    val loose = TextAnalysis.dropDuplicatedLines(docs, "text", "doc_id",
      minCount = 10L).orderBy("doc").collect().map(_.getString(1))
    assert(loose.toSeq == Seq("alpha\nBOILER\nbeta", "BOILER\ngamma",
      "BOILER\nBOILER"))
  }

  test("dup-line fraction: repeated lines counted, single-line docs 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b\nc d\na b\na b"), // 4 lines, 2 distinct → 0.5
      (2L, "only one line"),      // → 0.0
      (3L, "x\ny\nz")             // all distinct → 0.0
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextAnalysis.dupLineFraction(col("text")).as("f"))
      .orderBy("doc_id").collect().map(_.getDouble(1))
    assert(got.toSeq == Seq(0.5, 0.0, 0.0))
  }

  test("sequence packing: exact prefix offsets, partitioning-independent") {
    import spark.implicits._
    // token counts 3, 5, 4, 6, 2 with seqLen 8:
    // cum_before: 0, 3, 8, 12, 18
    // seq_first:  0, 0, 1, 1, 2
    // seq_last = (cum_before + n - 1) div 8: 0, 0, 1, 2, 2  (doc 3 spans)
    val docs = Seq(
      (0L, "a b c"), (1L, "a b c d e"), (2L, "a b c d"),
      (3L, "a b c d e f"), (4L, "a b")
    ).toDF("doc_id", "text")
    val got = SeqPack.packOffsets(spark, docs, "text", "doc_id", seqLen = 8L)
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 0L, 0L, 0L), (1L, 3L, 0L, 0L), (2L, 8L, 1L, 1L),
      (3L, 12L, 1L, 2L), (4L, 18L, 2L, 2L)))
    // the distributed prefix must not depend on partition count
    val one = SeqPack.packOffsets(spark, docs, "text", "doc_id", 8L, numParts = 1)
      .orderBy("doc").collect().toSeq
    val many = SeqPack.packOffsets(spark, docs, "text", "doc_id", 8L, numParts = 7)
      .orderBy("doc").collect().toSeq
    assert(one == many)
  }

  test("curriculum packing: offsets follow the order column, not the id") {
    import spark.implicits._
    // difficulty 2, 0, 1 -> pack order is docs 1 (5 tok), 2 (4), 0 (3)
    // cum_before in pack order: 0, 5, 9
    val docs = Seq(
      (0L, "a b c", 2L), (1L, "a b c d e", 0L), (2L, "a b c d", 1L)
    ).toDF("doc_id", "text", "diff")
    val got = SeqPack.packOffsetsBy(spark, docs, "text", "doc_id",
        seqLen = 8L, orderCols = Seq("diff"))
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0L, 9L, 1L, 1L), (1L, 0L, 0L, 0L), (2L, 5L, 0L, 1L)))
    // empty order list degenerates to id-ordered packOffsets
    val a = SeqPack.packOffsetsBy(spark, docs, "text", "doc_id", 8L,
      Seq.empty, numParts = 5).orderBy("doc").collect().toSeq
    val b = SeqPack.packOffsets(spark, docs, "text", "doc_id", 8L)
      .orderBy("doc").collect().toSeq
    assert(a == b)
    // partition-count independence holds under the curriculum order
    val one = SeqPack.packOffsetsBy(spark, docs, "text", "doc_id", 8L,
      Seq("diff"), numParts = 1).orderBy("doc").collect().toSeq
    val many = SeqPack.packOffsetsBy(spark, docs, "text", "doc_id", 8L,
      Seq("diff"), numParts = 7).orderBy("doc").collect().toSeq
    assert(one == many)
  }

  test("repetition signals: hand-computed bigram/trigram shares") {
    import spark.implicits._
    val docs = Seq(
      // bigrams: [a b, b a, a b, b a, a b] → top "a b" 3/5 = 0.6
      // trigrams: [a b a, b a b, a b a, b a b] → all dup'd → 1.0
      (1L, "a b a b a b"),
      // bigrams all distinct → 1/4 = 0.25; trigrams distinct → 0.0
      (2L, "v w x y z"),
      // too short for trigrams: bigram "p q" 1/1 = 1.0, trigram → 0.0
      (3L, "p q")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs, "text", "doc_id")
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 0.6, 1.0), (2L, 0.25, 0.0), (3L, 1.0, 0.0)))
  }
}
