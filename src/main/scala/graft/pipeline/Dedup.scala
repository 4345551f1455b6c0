package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines, each designed
  * as a shuffle-frugal DataFrame transform:
  *
  *  - exact: hash-groupBy on a normalized fingerprint — one shuffle on
  *    a 128-bit key, no pairwise work, embarrassing scale;
  *  - MinHash + LSH: shingle → minhash signature → band buckets →
  *    equi-join on (band, bucket) → exact-Jaccard verify. Candidate
  *    generation is an equi-join (shuffle on bucket id), never a
  *    cross join — the standard 100 TB near-dup shape;
  *  - SimHash: 64-bit signature; near-dup = small Hamming distance,
  *    banded into 4×16-bit keys so candidates are again an equi-join;
  *  - n-gram Jaccard: exact pairwise similarity via an inverted
  *    shingle index (explode → self-equi-join → group), the oracle for
  *    the approximate paths;
  *  - embedding cosine: blocked pairwise cosine (block key = caller's
  *    choice, e.g. a cluster/label column or LSH bucket) — never a
  *    full cross join.
  */
object Dedup {

  /** Exact dedup groups: fingerprint → (keepId, groupSize). */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))

  /** [[exactGroups]] over the NFC-normalized fingerprint: byte-level
    * dedup that merges composed/decomposed Unicode spellings
    * ([[TextAnalysis.normalizedFingerprint]]). Same hash-groupBy
    * scale shape — one map-side-combinable aggregation, no pairs.
    */
  def normalizedGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextAnalysis.normalizedFingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))

  /** Exact dedup: keep the lowest id per fingerprint. */
  def dropExactDups(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }

  /** Exact pairwise n-gram Jaccard ≥ threshold via an inverted shingle
    * index: explode shingles, self-equi-join on the shingle, count
    * intersections per pair, fetch set sizes. Only pairs sharing ≥1
    * shingle are ever materialized.
    *
    * `maxShingleDf` > 0 drops stop-shingles — shingles occurring in
    * more than that many documents — from the inverted index before
    * the self-join. The join's output is quadratic in posting-list
    * length (Σ df² over shingles), so ONE corpus-common trigram would
    * otherwise dominate the whole job at scale; the cap bounds
    * per-shingle join work to maxDf². Set sizes keep the FULL
    * distinct-shingle count, so the reported jac is a lower bound of
    * true Jaccard and pairs sharing only stop-shingles are dropped —
    * the intended behavior, since corpus-common boilerplate shingles
    * carry no near-duplicate signal. The hot set is the HEAD of the
    * shingle frequency curve, so it GROWS with the corpus — the
    * anti-join is left un-hinted (AQE broadcasts only while it
    * measures small; at extreme corpus sizes the df scan could also
    * run on a sample, since df > cap survives sampling).
    */
  def jaccardPairs(df: DataFrame, textCol: String, idCol: String, w: Int,
                   threshold: Double, maxShingleDf: Int = 0): DataFrame = {
    // postings keyed by a 64-bit shingle hash (8-byte shuffle keys, no
    // collision risk at exact-pairwise scale) and CARRYING the doc's
    // distinct-shingle count: the pair aggregation then needs no
    // size-lookup joins. Hashes come from the single-pass rolling-hash
    // UDF — shingle STRINGS are never materialized (w-token substrings
    // allocate w× the document text; the rolling fold allocates
    // nothing). The sets frame is checkpointed BEFORE fan-out: it has
    // three consumers (df-cap aggregate + both self-join sides), and
    // without the pin each consumer re-scans the input and CollapseProject
    // plus constraint-derived filters re-run the UDF 2-3× per row per
    // scan (observed in the r3 plan: 4 scans × triple evaluation).
    val sets = df.select(col(idCol).as("doc"),
        array_distinct(TextAnalysis.shingleHashes(col(textCol), w)).as("shs"))
      .localCheckpoint(true)
    val ex0 = sets
      .select(col("doc"), size(col("shs")).as("n"), explode(col("shs")).as("h"))
    val ex =
      if (maxShingleDf <= 0) ex0
      else {
        val hot = ex0.groupBy(col("h")).agg(count(lit(1)).as("df"))
          .where(col("df") > maxShingleDf)
          .select(col("h"))
        // no broadcast hint: the hot set is the HEAD of the shingle
        // Zipf curve and grows with the corpus (#{df > cap} ∝ N/cap —
        // 10⁸+ at 100 TB); AQE broadcasts it only while it measures
        // small, the same unbounded-side rule as tfidfTopTerms
        ex0.join(hot, Seq("h"), "left_anti")
      }
    // AllPairs length filter (Bayardo et al. WWW'07), same bound as
    // jaccardPairsPrefix: c ≤ min(na,nb) and J = c/(na+nb−c) ≥ t force
    // na ≥ t·nb and nb ≥ t·na (valid here too — with a df cap, c only
    // shrinks while na/nb stay full, so the computed jac is a lower
    // bound and the same necessary condition applies).
    // Size-incompatible collisions die inside the join instead of
    // surviving to the pair aggregation. 1e-9 slack keeps
    // exact-boundary pairs (t·n is a float; the true bound is rational).
    val eps = 1e-9
    ex.as("a").join(ex.as("b"),
        col("a.h") === col("b.h") && col("a.doc") < col("b.doc") &&
          col("a.n").cast("double") >= lit(threshold) * col("b.n") - lit(eps) &&
          col("b.n").cast("double") >= lit(threshold) * col("a.n") - lit(eps))
      .groupBy(col("a.doc").as("d1"), col("b.doc").as("d2"))
      .agg(count(lit(1)).as("c"), first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
      .select(col("d1"), col("d2"),
        (col("c").cast(DoubleType) / (col("na") + col("nb") - col("c"))).as("jac"))
      .where(col("jac") >= threshold)
  }

  /** Cross-corpus near-dup pairs — the decontamination shape: which
    * `left` documents (training corpus) share Jaccard ≥ threshold with
    * a `right` document (eval/benchmark set)? Same inverted-index
    * df-capped join ledger as [[jaccardPairs]], but postings join
    * ACROSS the two frames, so the output is (left_doc, right_doc,
    * jac) with no within-corpus pairs. The df cap is computed over the
    * UNION of both corpora (a shingle common across either side is
    * equally useless as evidence). Right is typically the small side —
    * at scale its postings broadcast.
    */
  def crossJaccardPairs(left: DataFrame, right: DataFrame, textCol: String,
                        idCol: String, w: Int, threshold: Double,
                        maxShingleDf: Int = 0): DataFrame = {
    def postings(df: DataFrame) = df.select(col(idCol).as("doc"),
        array_distinct(TextAnalysis.shingleHashes(col(textCol), w)).as("shs"))
      .localCheckpoint(true)
      .select(col("doc"), size(col("shs")).as("n"), explode(col("shs")).as("h"))
    val pl = postings(left)
    val pr = postings(right)
    val (fl, fr) =
      if (maxShingleDf <= 0) (pl, pr)
      else {
        val hot = pl.select(col("h")).union(pr.select(col("h")))
          .groupBy(col("h")).agg(count(lit(1)).as("df"))
          .where(col("df") > maxShingleDf).select(col("h"))
        // un-hinted for the same Zipf-head reason as jaccardPairs
        (pl.join(hot, Seq("h"), "left_anti"),
          pr.join(hot, Seq("h"), "left_anti"))
      }
    // Same AllPairs length bound as jaccardPairs — necessary for
    // J ≥ t, so the oracle is unchanged; size-incompatible collisions
    // never reach the pair aggregation.
    val eps = 1e-9
    fl.as("a").join(fr.as("b"), col("a.h") === col("b.h") &&
        col("a.n").cast("double") >= lit(threshold) * col("b.n") - lit(eps) &&
        col("b.n").cast("double") >= lit(threshold) * col("a.n") - lit(eps))
      .groupBy(col("a.doc").as("left_doc"), col("b.doc").as("right_doc"))
      .agg(count(lit(1)).as("c"), first(col("a.n")).as("na"),
        first(col("b.n")).as("nb"))
      .select(col("left_doc"), col("right_doc"),
        (col("c").cast(DoubleType) / (col("na") + col("nb") - col("c"))).as("jac"))
      .where(col("jac") >= threshold)
  }

  /** The Bloom build [[crossJaccardPairsBloom]] uses, over a postings
    * frame with an `h` hash column. One definition, shared with the
    * ScaleCurve measurement so the quantified filter is the shipped
    * one. Bloom insertion is idempotent, so it aggregates straight
    * over raw postings — no distinct shuffle; the posting count
    * (≥ distinct count) as expectedNumItems only over-sizes the bits,
    * tightening the real fpp. None on an empty frame (Spark's
    * stat.bloomFilter NPEs there).
    */
  private[graft] def postingsBloom(posts: DataFrame, fpp: Double)
      : Option[org.apache.spark.util.sketch.BloomFilter] = {
    val nItems = posts.count()
    if (nItems == 0L) None
    else Some(posts.stat.bloomFilter("h", nItems, fpp))
  }

  /** The reusable EVAL-side artifact for decontamination ON INGEST:
    * the checkpointed, exploded eval-shingle postings plus their
    * broadcast Bloom filter. [[crossJaccardPairsBloom]] builds this
    * per call; a streaming ingest ([[graft.streaming.StreamingDecontam]])
    * builds it ONCE and probes it with every training microbatch —
    * the eval set is frozen for the run, so rebuilding its postings
    * per batch would be pure waste. `bloom` is None iff the eval
    * side was empty (nothing can be contaminated). The shingling
    * parameters (textCol, idCol, w) RIDE THE ARTIFACT: the probe
    * must shingle the training side identically or it returns
    * plausible-but-wrong Jaccards, so they are set once at build and
    * cannot drift per call. The caller owns the checkpoint:
    * [[releaseDecontamEval]] when done.
    */
  final case class DecontamEval private[pipeline] (
      postings: DataFrame,
      bloom: Option[org.apache.spark.util.sketch.BloomFilter],
      textCol: String, idCol: String, w: Int)

  /** Build the [[DecontamEval]] artifact over the eval corpus. */
  def decontamEval(eval: DataFrame, textCol: String, idCol: String,
                   w: Int, fpp: Double = 0.01): DecontamEval = {
    // eval side: SMALL by assumption; checkpoint once, reused by the
    // bloom build and every join probe
    val pr = explodePostings(shingled(eval, textCol, idCol, w)
      .localCheckpoint(true))
    DecontamEval(pr, postingsBloom(pr, fpp), textCol, idCol, w)
  }

  def releaseDecontamEval(ev: DecontamEval): Unit =
    graft.core.Pinned.release(ev.postings)

  private def shingled(df: DataFrame, textCol: String, idCol: String,
                       w: Int) =
    df.select(col(idCol).as("doc"),
      array_distinct(TextAnalysis.shingleHashes(col(textCol), w)).as("shs"))

  private def explodePostings(sets: DataFrame) = sets.select(col("doc"),
    size(col("shs")).as("n"), explode(col("shs")).as("h"))

  /** [[crossJaccardPairs]] with a Bloom-filter prefilter on the big
    * side — the decontamination shape at 100 TB: the eval corpus is
    * small (benchmarks), the training corpus is the 100 TB side, and
    * without pruning EVERY training posting shuffles into the
    * cross-corpus join. A Bloom filter over the eval side's distinct
    * shingle hashes (built once, broadcast, ~10 bits/item) drops
    * non-colliding training postings AT THE SCAN (map-side, before
    * the exchange), cutting the shuffled volume to roughly the
    * colliding fraction × (1 + fpp).
    *
    * EXACTLY equal to [[crossJaccardPairs]] by construction: Bloom
    * filters have no false negatives, so every posting that matches an
    * eval shingle survives; false positives only pass postings the
    * equi-join discards anyway; and set sizes (`na`/`nb`) are computed
    * from the FULL sets before filtering, so Jaccard values are
    * untouched. The decontam oracle is therefore shared verbatim.
    *
    * Pin note: the eval artifact's checkpoint lives until the
    * session's next unpersist sweep — the returned frame still
    * references it, so it cannot be released here. One-shot batch
    * callers leak ONE small pin per call (Bench clears them between
    * queries); the streaming ingest builds the artifact itself and
    * releases it at run close.
    */
  def crossJaccardPairsBloom(left: DataFrame, right: DataFrame,
                             textCol: String, idCol: String, w: Int,
                             threshold: Double,
                             fpp: Double = 0.01): DataFrame =
    crossJaccardPairsAgainst(left,
      decontamEval(right, textCol, idCol, w, fpp), threshold)

  /** Probe a training increment against a prebuilt [[DecontamEval]] —
    * the per-microbatch call of decontamination ON INGEST. Pairs are
    * per-(left, right) independent (each left doc's shingle set is
    * local to it), so the union of per-increment results over any
    * batching of the training side equals the one-shot
    * [[crossJaccardPairs]] — which is what oracles the streamed path.
    */
  def crossJaccardPairsAgainst(left: DataFrame, ev: DecontamEval,
                               threshold: Double): DataFrame = {
    import ev.{textCol, idCol, w}
    val pr = ev.postings
    // empty eval side: nothing can be contaminated (and there was no
    // bloom to build — Spark's stat.bloomFilter NPEs on an empty
    // frame). The empty result takes left_doc's type from the LEFT
    // frame and right_doc's from the eval postings (the non-empty
    // path's schema) — both limited to zero rows, so the crossJoin
    // is free.
    val bloom = ev.bloom.getOrElse(
      return left.select(col(idCol).as("left_doc")).limit(0)
        .crossJoin(pr.select(col("doc").as("right_doc")).limit(0))
        .withColumn("jac", lit(0.0)))
    // left (training) side: NO checkpoint — materializing the 100 TB
    // side's shingle arrays before the filter would pay exactly the
    // cost this operator exists to avoid. The price is the shingle
    // expression re-evaluating 2-3× per row under constraint-derived
    // filters (size/explode consumers) — map-side CPU, which beats
    // writing the whole postings frame to the block manager. Rows
    // stream scan → filter → exchange, pruned before the shuffle. The
    // probe itself is the codegen'd [[graft.functions.BloomMightContain]]
    // (sketch as a plan reference object — Spark broadcasts the task
    // binary), so the biggest scan in the system carries no per-row UDF.
    val fl = explodePostings(shingled(left, textCol, idCol, w)).where(
      graft.functions.HashFunctions.bloomMightContain(col("h"), bloom))
    // AllPairs length bound, as in crossJaccardPairs (the Bloom filter
    // prunes by hash membership, this prunes by size compatibility —
    // independent, both necessary conditions for J ≥ t).
    val eps = 1e-9
    fl.as("a").join(pr.as("b"), col("a.h") === col("b.h") &&
        col("a.n").cast("double") >= lit(threshold) * col("b.n") - lit(eps) &&
        col("b.n").cast("double") >= lit(threshold) * col("a.n") - lit(eps))
      .groupBy(col("a.doc").as("left_doc"), col("b.doc").as("right_doc"))
      .agg(count(lit(1)).as("c"), first(col("a.n")).as("na"),
        first(col("b.n")).as("nb"))
      .select(col("left_doc"), col("right_doc"),
        (col("c").cast(DoubleType) / (col("na") + col("nb") - col("c"))).as("jac"))
      .where(col("jac") >= threshold)
  }

  /** Per-eval-document contamination fraction: the share of a
    * document's distinct w-gram shingles that appear ANYWHERE in the
    * training corpus — the number an eval card reports ("x% of
    * benchmark n-grams occur in training data"), complementing the
    * pairwise view of [[crossJaccardPairs]].
    *
    * Shape: train postings → distinct hashes (one map-combined
    * aggregation), then a LEFT SEMI equi-join from the eval postings
    * and a per-doc count — no pair rows ever materialize, so the cost
    * is linear in postings regardless of how contaminated the corpora
    * are (the pairwise join degrades when one eval doc matches
    * thousands of train docs; this never does).
    */
  def contaminationFraction(train: DataFrame, eval: DataFrame,
                            textCol: String, idCol: String,
                            w: Int): DataFrame = {
    val evalPosts = eval.select(col(idCol).as("doc"),
        array_distinct(TextAnalysis.shingleHashes(col(textCol), w)).as("shs"))
      .localCheckpoint(true) // two consumers: totals + the semi join
      .select(col("doc"), explode(col("shs")).as("h"))
    val trainHashes = train.select(
        explode(array_distinct(
          TextAnalysis.shingleHashes(col(textCol), w))).as("h"))
      .distinct()
    val contaminated = evalPosts.join(trainHashes, Seq("h"), "left_semi")
      .groupBy(col("doc")).agg(count(lit(1)).as("n_contaminated"))
    evalPosts.groupBy(col("doc")).agg(count(lit(1)).as("n_shingles"))
      .join(contaminated, Seq("doc"), "left")
      .select(col("doc"), col("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("frac",
        col("n_contaminated").cast(DoubleType) /
          col("n_shingles").cast(DoubleType))
  }

  // ---------------------------------------- exact substring spans --
  /** Exact duplicate-SPAN detection (Lee et al. 2022,
    * arXiv:2107.06499 "Deduplicating Training Data Makes Language
    * Models Better", the ExactSubstr family): every maximal token
    * span whose w-token windows ALL occur at least `minCount` times
    * corpus-wide. A duplicated substring of ≥ w tokens shares every
    * one of its windows with its other occurrence(s), so rolling
    * w-window fingerprints give the same detection power as the
    * paper's suffix array for repeats of length ≥ w, quantized to
    * token windows (64-bit FNV fingerprints stand in for byte-exact
    * comparison; collisions are ~n²/2⁶⁴).
    *
    * Scale shape (the reason this beats a suffix array on Spark): the
    * postings are one explode of the codegen'd
    * [[graft.functions.ShingleHashes]] scan — no vectors, no pairs;
    * the hot-window set is one map-combined count aggregation whose
    * OUTPUT is only the windows occurring ≥ minCount (the true
    * duplication mass, tiny next to the corpus); a semi-join marks
    * duplicate windows; and consecutive windows merge into maximal
    * spans with one per-document sort (gaps-and-islands — windows
    * whose positions differ by ≤ w overlap or touch, so they fuse).
    * Pairwise anything never materializes, so heavy duplication costs
    * linear work, not quadratic.
    *
    * Output: (doc, start_tok, end_tok) — token offsets in the
    * split(" ") coordinate system, end exclusive.
    */
  def duplicateSpans(df: DataFrame, textCol: String, idCol: String,
                     w: Int = 50, minCount: Int = 2): DataFrame = {
    val posts = dupPostings(df, textCol, idCol, w)
    windowsToSpans(
      posts.join(hotWindows(posts, minCount), Seq("h"), "left_semi"), w)
  }

  /** Gaps-and-islands merge of flagged (doc, pos) windows into
    * maximal (doc, start_tok, end_tok) spans — windows whose
    * positions differ by ≤ w overlap or touch, so they fuse.
    */
  private def windowsToSpans(dup: DataFrame, w: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc")).orderBy(col("pos"))
    dup
      // first window of a doc: lag is NULL → comparison NULL → break
      .withColumn("brk", when(col("pos") - lag(col("pos"), 1).over(byDoc) <= w,
        lit(0)).otherwise(lit(1)))
      .withColumn("island", sum(col("brk")).over(byDoc))
      .groupBy(col("doc"), col("island"))
      .agg(min(col("pos")).as("start_tok"),
        (max(col("pos")) + lit(w)).as("end_tok"))
      .select(col("doc"), col("start_tok"), col("end_tok"))
  }

  /** Per-document duplication signal from the same window fingerprints
    * as [[duplicateSpans]]: how many of a document's w-token windows
    * occur ≥ minCount times corpus-wide, and the fraction — the
    * curation-side number ("x% of this document is boilerplate /
    * copied") that decides filtering before any span surgery.
    * Documents shorter than w tokens have no windows and report 0/0/0.
    */
  def duplicateWindowStats(df: DataFrame, textCol: String, idCol: String,
                           w: Int = 50, minCount: Int = 2): DataFrame = {
    val posts = dupPostings(df, textCol, idCol, w)
    val dupPerDoc = posts.join(hotWindows(posts, minCount), Seq("h"), "left_semi")
      .groupBy(col("doc")).agg(count(lit(1)).as("dup_windows"))
    df.select(col(idCol).as("doc"),
        size(TextAnalysis.shingleHashes(col(textCol), w)).as("n_windows"))
      .join(dupPerDoc, Seq("doc"), "left")
      .select(col("doc"), col("n_windows").cast(LongType).as("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"))
      .withColumn("dup_frac",
        when(col("n_windows") > 0,
          col("dup_windows").cast(DoubleType) / col("n_windows").cast(DoubleType))
          .otherwise(lit(0.0)))
  }

  /** Span surgery completing the family: rebuild every document with
    * the tokens covered by a duplicate span REMOVED (the aggressive
    * all-occurrences variant — the production boilerplate-strip; the
    * paper's keep-one variant needs a global occurrence order and is
    * rarely what curation wants for templated text). Tokens and spans
    * share the split(" ") coordinate system of [[duplicateSpans]];
    * fully-duplicated documents come back as "" rather than vanishing.
    *
    * Shape: the span set is the OUTPUT of duplicate detection —
    * bounded by duplication mass — joined back to the exploded tokens
    * per document (equi-join on doc + a range predicate against that
    * doc's few spans), then one ordered rebuild per document. Three
    * shuffles total (hot-window agg, span join, rebuild), no pairs.
    */
  def dropDuplicateSpans(df: DataFrame, textCol: String, idCol: String,
                         w: Int = 50, minCount: Int = 2): DataFrame =
    removeSpans(df, duplicateSpans(df, textCol, idCol, w, minCount),
      textCol, idCol)

  /** Rebuild every document with the tokens covered by any span in
    * `spans` removed; fully-covered documents come back as "" rather
    * than vanishing. Tokens and spans share the split(" ") coordinate
    * system; end is exclusive.
    */
  private def removeSpans(df: DataFrame, spans: DataFrame,
                          textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc"),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
    val kept = toks.join(spans,
      toks("doc") === spans("doc") &&
        col("pos") >= col("start_tok") && col("pos") < col("end_tok"),
      "left_anti")
    val rebuilt = kept.groupBy(col("doc"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x("tok"))).as("cleaned"))
    df.select(col(idCol).as("doc"))
      .join(rebuilt, Seq("doc"), "left")
      .withColumn("cleaned", coalesce(col("cleaned"), lit("")))
  }

  /** Cross-corpus decontamination by SPAN SURGERY — the
    * minimal-removal alternative to dropping whole contaminated
    * documents ([[crossJaccardPairs]] flags; this excises): every
    * maximal training-side span whose w-token windows appear ANYWHERE
    * in the eval corpus is removed, and the rest of the document
    * survives — templated boilerplate around a quoted benchmark item
    * no longer costs the whole document.
    *
    * Shape: training windows are the usual [[dupPostings]] scan; the
    * eval side contributes only its window-hash SET (benchmark-sized,
    * so the semi-join's build side is tiny — Spark broadcasts it),
    * flagged windows merge gaps-and-islands into spans, and the
    * rebuild is [[dropDuplicateSpans]]'s. Eval text never joins
    * against training text — only 8-byte window hashes cross.
    */
  def decontamSpanScrub(train: DataFrame, eval: DataFrame,
                        textCol: String, idCol: String,
                        w: Int = 50): DataFrame = {
    val posts = dupPostings(train, textCol, idCol, w)
    val evalWindows = eval.select(
      explode(TextAnalysis.shingleHashes(col(textCol), w)).as("h"))
    val spans = windowsToSpans(
      posts.join(evalWindows, Seq("h"), "left_semi"), w)
    removeSpans(train, spans, textCol, idCol)
  }

  /** [[decontamSpanScrub]] against a prebuilt [[DecontamEval]] (built
    * with the SAME window width `w`) — the per-microbatch call of
    * span surgery ON INGEST. Per-doc local: a document's windows,
    * flagged spans, and rebuild never look at another training doc,
    * so the union of per-batch scrubs over any batching equals the
    * one-shot [[decontamSpanScrub]] — the decontam_span_scrub golden
    * oracles the streamed path verbatim.
    *
    * The eval artifact contributes its Bloom filter as the map-side
    * short-circuit ([[crossJaccardPairsAgainst]]'s 100 TB shape: no
    * false negatives ⇒ identical spans; false positives only pass
    * windows the semi-join discards) and its postings as the exact
    * membership set. An empty eval side scrubs nothing — but still
    * runs the rebuild, so the output is token-identical to the
    * non-empty path's untouched documents.
    */
  def decontamSpanScrubAgainst(train: DataFrame,
                               ev: DecontamEval): DataFrame = {
    import ev.{textCol, idCol, w}
    val posts = dupPostings(train, textCol, idCol, w)
    val flagged = ev.bloom match {
      case None => posts.limit(0)
      case Some(b) => posts
        .where(graft.functions.HashFunctions.bloomMightContain(col("h"), b))
        .join(ev.postings.select(col("h")), Seq("h"), "left_semi")
    }
    removeSpans(train, windowsToSpans(flagged, w), textCol, idCol)
  }

  /** (doc, pos, h) window postings shared by the span operators. */
  private def dupPostings(df: DataFrame, textCol: String, idCol: String,
                          w: Int): DataFrame =
    df.select(col(idCol).as("doc"),
      posexplode(TextAnalysis.shingleHashes(col(textCol), w)).as(Seq("pos", "h")))

  /** Window hashes occurring ≥ minCount times — map-combined count,
    * output bounded by the true duplication mass.
    */
  private def hotWindows(posts: DataFrame, minCount: Int): DataFrame =
    posts.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount).select(col("h"))

  /** EXACT pairwise Jaccard ≥ threshold via prefix filtering
    * (AllPairs / PPJoin, Bayardo et al. WWW'07; Xiao et al. WWW'08):
    * order every document's shingles by ascending global document
    * frequency (ties by hash), keep only the first
    * `|S| − ⌈t·|S|⌉ + 1` as join keys — any pair with true Jaccard ≥ t
    * must collide inside both prefixes — then verify candidates
    * against the full sets.
    *
    * Unlike the df-cap in [[jaccardPairs]] this sacrifices NO recall:
    * corpus-hot shingles (the quadratic-blowup makers) sort to the END
    * of every prefix order and so drop out of the join keys, while any
    * qualifying pair still collides on a rarer shared shingle. Shuffle
    * ledger: df count (map-combined), df lookup join (on hash), prefix
    * window (on doc), candidate self-join (on hash, prefix postings
    * only), verify join ×2 (on doc). All linear in postings except the
    * candidate join, which prefix filtering bounds.
    */
  def jaccardPairsPrefix(df: DataFrame, textCol: String, idCol: String,
                         w: Int, threshold: Double): DataFrame = {
    val sets = df.select(col(idCol).as("doc"),
        array_distinct(TextAnalysis.shingleHashes(col(textCol), w)).as("shs"))
      .where(size(col("shs")) > 0)
      .localCheckpoint(true) // reused 3×: prefix build + both verify sides
    val posts = sets.select(col("doc"), size(col("shs")).as("n"),
      explode(col("shs")).as("h"))
    val dfreq = posts.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val w1 = Window.partitionBy(col("doc")).orderBy(col("df"), col("h"))
    val prefix = posts.join(dfreq, Seq("h"))
      .withColumn("rk", row_number().over(w1))
      .where(col("rk") <=
        col("n") - ceil(lit(threshold) * col("n")).cast("long") + 1L)
      .select(col("h"), col("doc"), col("n"), col("rk"))
    // AllPairs length filter (Bayardo et al. WWW'07) inside the
    // candidate join: J ≥ t forces min(|A|,|B|) ≥ t·max(|A|,|B|) —
    // size-incompatible collisions never leave the join. The 1e-9
    // slack keeps exact-boundary pairs (t·n is computed in floating
    // point; the true bound is rational).
    val eps = 1e-9
    val collide = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.doc") < col("b.doc") &&
          col("a.n").cast("double") >= lit(threshold) * col("b.n") - lit(eps) &&
          col("b.n").cast("double") >= lit(threshold) * col("a.n") - lit(eps))
    // Positional filter (Xiao et al. WWW'08): both docs' shingle sets
    // are sorted by the same global (df, h) order, so the earliest
    // collision (minimal rk — the same row minimizes both sides) has
    // NO common element before it, giving the tight upper bound
    // inter ≤ 1 + min(n1−r1, n2−r2); J ≥ t needs inter ≥
    // t/(1+t)·(n1+n2). The min-rk aggregate replaces the old
    // .distinct() — same shuffle, strictly fewer surviving pairs.
    val reqFactor = threshold / (1.0 + threshold)
    val cand = collide
      .groupBy(col("a.doc").as("d1"), col("b.doc").as("d2"),
        col("a.n").as("n1"), col("b.n").as("n2"))
      .agg(min(col("a.rk")).as("r1"), min(col("b.rk")).as("r2"))
      .where((lit(1L) + least(col("n1") - col("r1"), col("n2") - col("r2")))
        .cast("double") >= lit(reqFactor) * (col("n1") + col("n2")) - lit(eps))
      .select(col("d1"), col("d2"))
    cand
      .join(sets.select(col("doc").as("d1"), col("shs").as("s1")), Seq("d1"))
      .join(sets.select(col("doc").as("d2"), col("shs").as("s2")), Seq("d2"))
      .select(col("d1"), col("d2"),
        graft.functions.HashFunctions.jaccardSim(col("s1"), col("s2")).as("jac"))
      .where(col("jac") >= threshold)
  }

  // ------------------------------------------------------------- MinHash
  /** Band bucket keys from a shingle-hash array — one pass per row,
    * backed by the codegen'd [[graft.functions.MinhashBandKeys]]
    * expression (signature + FNV band fold fused; emitting the
    * signature as its own column gets it re-run bands× under
    * CollapseProject, and the UDF predecessor copied the hash array
    * out of ArrayData per row).
    */
  private[pipeline] def minhashBandKeys(hs: Column, bands: Int, rows: Int,
                                        seed: Long): Column =
    graft.functions.ColumnBridge.column(
      graft.functions.MinhashBandKeys(
        graft.functions.ColumnBridge.expression(hs), bands, rows, seed))

  /** MinHash-LSH near-dup candidate pairs: signature split into
    * `bands` bands of `rows` hashes; docs sharing any band bucket are
    * candidates; candidates verified with exact Jaccard over the
    * shingle sets. Every join is an equi-join.
    */
  def minhashCandidatePairs(df: DataFrame, textCol: String, idCol: String,
                            w: Int = 3, bands: Int = 16, rows: Int = 4,
                            threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    // The shingle-hash frame is checkpointed once and reused three
    // ways: band-key derivation plus both sides of the verify
    // back-join. Band rows carry (doc, band, bucket) ONLY — three
    // scalars — so the LSH exchange never ships a signature array;
    // the naive alternative (hs alongside the band keys) duplicates
    // every document's full hash set bands× through the shuffle and
    // drags two arrays per candidate through the dedup, which
    // dominates at corpus scale.
    val sh = df.select(col(idCol).as("doc"),
        TextAnalysis.shingleHashes(col(textCol), w).as("hs"))
      .where(size(col("hs")) > 0)
      .localCheckpoint(true)
    val banded = sh.select(col("doc"),
        posexplode(minhashBandKeys(col("hs"), bands, rows, seed)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("d1"), col("b.doc").as("d2"))
      .distinct()
    cand
      .join(sh.select(col("doc").as("d1"), col("hs").as("h1")), Seq("d1"))
      .join(sh.select(col("doc").as("d2"), col("hs").as("h2")), Seq("d2"))
      .select(col("d1"), col("d2"),
        graft.functions.HashFunctions.jaccardSim(col("h1"), col("h2")).as("jac"))
      .where(col("jac") >= threshold)
  }

  /** Connected components over near-dup pairs by iterative min-label
    * propagation: each doc's label converges to the smallest doc id in
    * its component. O(diameter) rounds, each an equi-join + groupBy —
    * near-dup clusters are shallow (diameter ≪ 20 in practice), and
    * every round is shuffle-bounded by the edge list, so this is the
    * standard large-scale shape (GraphX-free).
    */
  private def unpersistPinned(df: DataFrame): Unit = graft.core.Pinned.release(df)

  /** Edge lists at or below this collect to the driver for a
    * union-find pass (~16 bytes/edge ⇒ ≲80 MB at the default): the
    * iterative path costs O(diameter) Spark jobs, a multi-second fixed
    * floor that dwarfs small/medium clusterings. Same labels either
    * way (min-id per component); the join loop engages beyond the
    * threshold, where the edge list must stay distributed.
    */
  val MaxDriverEdges: Long = 5000000L

  private def unionFindClusters(spark: org.apache.spark.sql.SparkSession,
                                edges: Array[(Long, Long)]): DataFrame = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent(x) != x) {
        parent(x) = parent(parent(x)) // path halving
        x = parent(x)
      }
      x
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a)
      val rb = find(b)
      // union by MIN id — the root IS the component label
      if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
    }
    import spark.implicits._
    parent.keys.toSeq.sorted.map(d => (d, find(d))).toDF("doc", "cluster")
  }

  def nearDupClusters(pairs: DataFrame, maxIters: Int = 20,
                      maxDriverEdges: Long = MaxDriverEdges): DataFrame = {
    // pin the caller's `pairs` FIRST — it is typically an expensive
    // similarity query, and every derived frame below (sym, docs,
    // edges, initial labels) would re-evaluate it otherwise.
    // Self-loops fold the keep-own-label update into the same
    // propagate aggregation: one join + one groupBy per round.
    val p = pairs.select(col("d1"), col("d2")).localCheckpoint(true)
    val integralIds = p.schema.fields.forall(f => f.dataType match {
      case _: org.apache.spark.sql.types.LongType |
           _: org.apache.spark.sql.types.IntegerType => true
      case _ => false
    })
    if (integralIds && p.count() <= maxDriverEdges) {
      val edges = p.select(col("d1").cast("long"), col("d2").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val out = unionFindClusters(p.sparkSession, edges)
      unpersistPinned(p)
      return out
    }
    val sym = p.select(col("d1").as("src"), col("d2").as("dst"))
      .union(p.select(col("d2").as("src"), col("d1").as("dst")))
    val docs = sym.select(col("src").as("doc")).distinct()
    val edges = sym
      .union(docs.select(col("doc").as("src"), col("doc").as("dst")))
      .localCheckpoint(true)
    var labels = docs.withColumn("lbl", col("doc")).localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val updated = edges.join(labels, edges("src") === labels("doc"))
        .groupBy(col("dst").as("doc")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint(true) // pin each round; lineage grows otherwise
      // convergence check every other round (it costs a join+count)
      if (iter % 2 == 1 || iter == maxIters - 1) {
        val changed = updated.as("u")
          .join(labels.withColumnRenamed("lbl", "old").as("o"), "doc")
          .where(col("lbl") =!= col("old")).limit(1).count()
        converged = changed == 0
      }
      unpersistPinned(labels) // superseded round, blocks no longer needed
      labels = updated
      iter += 1
    }
    unpersistPinned(p)
    unpersistPinned(edges)
    labels.withColumnRenamed("lbl", "cluster")
  }

  /** Keep one representative (the smallest id) per near-dup cluster;
    * docs in no pair survive untouched.
    */
  def dropNearDups(df: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val clusters = nearDupClusters(pairs)
    val losers = clusters.where(col("doc") =!= col("cluster"))
      .select(col("doc").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Keep the BEST-scoring representative per near-dup cluster
    * (highest `scoreCol`, ties to the smallest id) instead of
    * [[dropNearDups]]'s min-id rule — the curation-grade variant: of
    * a scrape/re-scrape near-dup family, keep the longest/cleanest
    * copy, not whichever crawled first. Docs in no pair survive
    * untouched.
    *
    * 100 TB shape: only CLUSTERED docs (the slim (doc, cluster)
    * frame) join the score column and rank inside their cluster
    * (near-dup clusters are small); the corpus itself sees one
    * anti-join against the slim loser set — the big table is never
    * windowed or shuffled on cluster.
    */
  def dropNearDupsBy(df: DataFrame, pairs: DataFrame, idCol: String,
                     scoreCol: String): DataFrame = {
    val clusters = nearDupClusters(pairs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col(scoreCol).desc, col("doc"))
    val losers = clusters
      .join(df.select(col(idCol).as("doc"), col(scoreCol)), Seq("doc"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") > 1)
      .select(col("doc").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------------------- SimHash
  /** 64-bit SimHash over token hashes. NULL text signs as the empty
    * document (signature 0L) rather than propagating NULL — null-text
    * rows must keep flowing through batch banding and the streaming
    * index (the pre-conversion UDF's null-to-"" contract).
    */
  def simhash64(text: Column): Column =
    graft.functions.HashFunctions.simhash64(coalesce(text, lit("")))

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, banded
    * into 4×16-bit sub-keys (pigeonhole: distance ≤ 3 ⇒ at least one
    * identical 16-bit quarter) so candidates come from an equi-join.
    * Recall is exact only for maxDist ≤ 3; beyond that the band join
    * is a candidate filter (raise the band count for higher budgets).
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxDist: Int = 3): DataFrame = {
    val sig = df.select(col(idCol).as("doc"),
      Dedup.simhash64(col(textCol)).as("sh"))
    val banded = sig.select(col("doc"), col("sh"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sh"), b * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("d1"), col("b.doc").as("d2"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("dist"))
      .dropDuplicates("d1", "d2")
      .where(col("dist") <= maxDist)
  }

  /** Embedding-cosine near-dup pairs within blocks (block = any
    * equi-join key: cluster id, label, LSH bucket). Never a full cross
    * join; at 100 TB the block key comes from a coarse quantizer.
    */
  def cosinePairsBlocked(df: DataFrame, vecCol: String, idCol: String,
                         blockCol: String, threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions._
    val a = df.select(col(blockCol).as("blk"), col(idCol).as("d1"), col(vecCol).as("v1"))
    val b = df.select(col(blockCol).as("blk"), col(idCol).as("d2"), col(vecCol).as("v2"))
    a.join(b, Seq("blk")).where(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), cosineSimD(col("v1"), col("v2")).as("sim"))
      .where(col("sim") >= threshold)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication by clustering embeddings with a k-means coarse
    * quantizer, then dropping, within each cluster, every vector that
    * has a LOWER-id cluster-mate above the cosine threshold — so each
    * semantic duplicate group keeps exactly its lowest-id member
    * (deterministic representative; the paper keeps one arbitrary
    * point per ε-ball).
    *
    * Scale shape: training is [[Ivf.train]]'s bounded driver-side fold
    * (the faiss design), assignment is one scan, and the duplicate
    * test is a WITHIN-CLUSTER self-equi-join — candidates are bounded
    * by cluster size, never all-pairs, exactly like the paper's
    * per-cluster pairwise pass. Total candidate work is n²/nlist, so
    * at 100 TB nlist grows PROPORTIONALLY with the corpus (the paper
    * uses ~100k clusters for billions of points): cluster size — and
    * with it per-row join work — stays flat, and the join keeps the
    * same plan. A pathological giant cluster is the skew risk; AQE's
    * skew-join split or a salt on the cluster id handles it.
    *
    * Output: every input row with its `cluster` id and a `keep` flag —
    * callers filter `keep` to materialize the deduplicated corpus, or
    * aggregate the flag for duplication-rate reporting.
    */
  /** nlist at or above which [[semDedup]] trains the two-level
    * quantizer: under the nlist-∝-corpus contract both the flat
    * driver fold (sample×nlist dots/iter) and the flat per-row assign
    * (nlist dots/row) stop scaling around here, and the hierarchical
    * model bounds both at ~√nlist while [[graft.pipeline.IvfNearest]]
    * descends it on the corpus scan. Below it the flat model is
    * cheaper and bit-stable with the existing oracle.
    */
  val SemDedupHierNlist = 1024

  def semDedup(emb: DataFrame, vecCol: String, idCol: String,
               threshold: Double, nlist: Int = 16, iters: Int = 3,
               seed: Long = 42L): DataFrame = {
    // ONE Spark job covers totality check + corpus count + train
    // sample (r7 paid three: emb.isEmpty, TrainSample's count(), the
    // filtered collect) — an empty sample means an empty corpus, so
    // return the contract schema instead of letting the trainers'
    // non-empty require escape
    val sample = TrainSample.collectWithTotal(emb, vecCol, idCol, seed,
      maxTrainRows = 200000L)._1
    if (sample.isEmpty)
      return emb.withColumn("cluster", lit(0)).withColumn("keep", lit(true))
    val model =
      if (nlist >= SemDedupHierNlist)
        Ivf.trainHierarchicalFromSample(sample, nlist, iters, seed)
      else Ivf.trainFromSample(sample, nlist, iters, seed)
    // materialize the assignment ONCE: semDedupPostings scans its
    // input three times (both join sides + the keep-flag join), and
    // the assign UDF costs nlist centroid dots per row — at nlist ∝
    // corpus (the operator contract) a 3× re-run is the dominant
    // cost. Callers with an on-disk index use semDedupPostings
    // directly and skip this (parquet re-reads prune by column).
    semDedupPostings(Ivf.assign(emb, vecCol, model).localCheckpoint(true),
      vecCol, idCol, threshold)
  }

  /** [[semDedup]] with the FULL-CORPUS deterministic trainers
    * ([[Ivf.trainDistributed]] / [[Ivf.trainHierarchicalDistributed]]
    * past [[SemDedupHierNlist]]) instead of the bounded driver
    * sample — the end-to-end scale path: at nlist ∝ corpus the sample
    * under-represents exactly the rare clusters semantic dedup exists
    * to separate, and the fixed-point folds keep the model (hence
    * every cluster id and keep flag) bit-reproducible across
    * partitionings. Same output contract and pair kernel as
    * [[semDedup]]; its own pinned algorithm with its own golden.
    */
  def semDedupDistributed(emb: DataFrame, vecCol: String, idCol: String,
                          threshold: Double, nlist: Int = 16,
                          iters: Int = 3, seed: Long = 42L): DataFrame = {
    if (emb.isEmpty)
      return emb.withColumn("cluster", lit(0)).withColumn("keep", lit(true))
    val model =
      if (nlist >= SemDedupHierNlist)
        Ivf.trainHierarchicalDistributed(emb, vecCol, idCol, nlist, iters,
          seed)
      else Ivf.trainDistributed(emb, vecCol, idCol, nlist, iters, seed)
    semDedupPostings(Ivf.assign(emb, vecCol, model).localCheckpoint(true),
      vecCol, idCol, threshold)
  }

  /** [[semDedup]] from an already-assigned postings frame (a `cluster`
    * column present — e.g. [[Ivf.readIndex]] over the on-disk layout).
    * At 100 TB this is the shape to use: materialize the assignment
    * once, then both sides of the within-cluster join read it instead
    * of re-running the quantizer per side.
    */
  def semDedupPostings(assigned: DataFrame, vecCol: String, idCol: String,
                       threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions._
    val a = assigned.select(col("cluster"), col(idCol).as("id"), col(vecCol).as("v"))
    val b = assigned.select(col("cluster"), col(idCol).as("id2"), col(vecCol).as("v2"))
    // a row is dropped iff SOME lower-id cluster-mate is near enough:
    // a semi-join, so no pair row survives past the probe
    val dropped = a.join(b, Seq("cluster"))
      .where(col("id2") < col("id") &&
        cosineSimD(col("v"), col("v2")) > threshold)
      .select(col("id")).distinct()
      .withColumn("__dropped", lit(true))
    assigned
      .join(dropped.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("keep", coalesce(col("__dropped"), lit(false)) === lit(false))
      .drop("__dropped")
  }
}
