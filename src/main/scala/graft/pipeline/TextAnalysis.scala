package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis columns for large-scale training-data pipelines:
  * token counting, quality scoring, language ID, fingerprinting.
  * All pure column expressions (codegen'd, no UDFs) so they pushdown/
  * prune/scale like any other projection.
  */
object TextAnalysis {

  /** Whitespace tokens. Single-space split to match the corpus shape
    * and the DuckDB oracle (`string_split(text, ' ')`).
    */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** BPE-ish subword count approximation: runs of letters, digits
    * one-by-one, or single non-space symbols — a deterministic regex
    * proxy for a real tokenizer's piece count.
    */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"),
      t => t =!= "" && t =!= " ")).cast(LongType)

  /** Mean characters per token — `n_chars / n_tokens` in double. */
  def charsPerToken(text: Column, nChars: Column): Column =
    round(nChars.cast(DoubleType) / tokenCount(text), 4)

  private val StopwordsEn: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

  def stopwordRatio(text: Column): Column =
    round(size(filter(tokens(text), t => t.isInCollection(StopwordsEn)))
      .cast(DoubleType) / size(tokens(text)), 4)

  /** Punctuation density over characters. */
  def punctRatio(text: Column): Column =
    round((length(text) - length(regexp_replace(text, "[\\p{Punct}]", "")))
      .cast(DoubleType) / length(text), 4)

  /** Composite quality score in [0,1]: length saturation × running
    * prose-likeness. Deterministic arithmetic only, so engines agree.
    */
  def qualityScore(text: Column): Column = {
    val lenSat = least(lit(1.0), tokenCount(text).cast(DoubleType) / lit(100.0))
    val stop = size(filter(tokens(text), t => t.isInCollection(StopwordsEn)))
      .cast(DoubleType) / size(tokens(text))
    round(lenSat * (lit(0.5) + lit(0.5) * least(lit(1.0), stop * lit(5.0))), 4)
  }

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text. Stable across engines (DuckDB `md5()` agrees), ideal exact
    * near-dup key at scale (hash-groupBy, no pairwise work).
    */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))).cast(BinaryType))

  /** [[fingerprint]] with UAX #15 NFC prepended: composed and
    * decomposed spellings of the same visual text (é vs e+U+0301)
    * collapse to one key — the CCNet-style canonicalization every
    * byte-level dedup needs on real web text. The NFC pass is a
    * codegen expression with an already-normalized fast path
    * ([[graft.functions.NormalizeExpressions]]), so an ASCII-heavy
    * corpus pays ~nothing for it.
    */
  def normalizedFingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(
      graft.functions.NormalizeExpressions.nfcNormalize(text),
      "\\s+", " "))).cast(BinaryType))

  /** Fraction of lines that repeat an earlier line (Gopher-style
    * repetition filter; C4 drops boilerplate the same way): `1 −
    * distinct/total`. Pure column expression for multiline corpora;
    * single-line documents score 0.
    */
  def dupLineFraction(text: Column): Column = {
    val lines = split(text, "\n")
    round(lit(1.0) -
      size(array_distinct(lines)).cast(DoubleType) / size(lines), 4)
  }

  /** Per-document n-gram repetition signals (Gopher Rule-style quality
    * filters for training corpora):
    *  - `top_bigram_frac`: occurrences of the most frequent word
    *    bigram / total bigrams (boilerplate headers score high);
    *  - `dup_trigram_frac`: fraction of trigram occurrences whose gram
    *    appears ≥ 2× in the document.
    *
    * Both are PER-DOCUMENT numbers, so the whole computation is one
    * map-side projection: a codegen'd per-row gram hashmap
    * ([[graft.functions.GramRepetition]]) — zero shuffles, zero joins.
    * (The relational predecessor exploded bigrams AND trigrams into
    * corpus-wide (doc, gram) aggregations plus two joins back: four
    * shuffles to move per-document statistics nowhere.) Linear in
    * tokens per row; survives any corpus size by construction.
    */
  def repetitionSignals(df: org.apache.spark.sql.DataFrame, textCol: String,
                        idCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("doc"),
      topNgramFrac(col(textCol), 2).as("top_bigram_frac"),
      dupNgramFrac(col(textCol), 3).as("dup_trigram_frac"))

  /** Most-frequent-n-gram share of a document, as a plain column
    * (composable into any projection — e.g. the curation chain
    * computes it alongside token counts with no join).
    */
  def topNgramFrac(text: Column, n: Int): Column =
    coalesce(graft.functions.HashFunctions
      .gramRepetition(tokens(text), n).getField("top_frac"), lit(0.0))

  /** Duplicated-n-gram occurrence share of a document (fraction of
    * n-gram occurrences whose gram appears ≥ 2×), as a plain column.
    */
  def dupNgramFrac(text: Column, n: Int): Column =
    coalesce(graft.functions.HashFunctions
      .gramRepetition(tokens(text), n).getField("dup_frac"), lit(0.0))

  /** Corpus vocabulary: term frequency + document frequency for every
    * whitespace token — the tokenizer-training / min-df-filter shape.
    * One explode feeding a single aggregation keyed by term; tf is
    * map-side combined, df is a two-phase distinct-by-(term, doc)
    * count. Shuffle volume is bounded by the token postings (linear in
    * corpus tokens), never by pairs — the same ledger as the dedup
    * family, so the plan survives a 100× corpus.
    */
  def vocabulary(df: org.apache.spark.sql.DataFrame, textCol: String,
                 idCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), count_distinct(col("doc")).as("df"))

  /** Top-k characteristic terms per document, scored `tf · N / df` — a
    * log-free idf surrogate (monotone in 1/df, so it ranks exactly like
    * `tf·idf` for fixed tf). The score is one IEEE division of exactly
    * representable integers (tf·N < 2^53), so engines agree bit-for-bit
    * with no libm or rounding in sight. The df side of the join is the
    * per-term document-frequency table — one row per DISTINCT corpus
    * token, which Heaps' law puts at 10⁸–10⁹ for an open web corpus,
    * so it is deliberately NOT broadcast-hinted: the tf⋈df join is a
    * plain equi-join on `term` and AQE promotes it to a broadcast only
    * when the measured vocabulary genuinely fits (small corpora), the
    * same unbounded-side discipline as the dedup family's
    * `maxShingleDf`. The per-doc top-k window sees tf-rows, not
    * tokens.
    */
  def tfidfTopTerms(df: org.apache.spark.sql.DataFrame, textCol: String,
                    idCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("doc"),
        explode(tokens(col(textCol))).as("term"))
      .where(col("term") =!= "")
    val n = df.count()
    val tf = toks.groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.groupBy(col("term")).agg(count_distinct(col("doc")).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(col("score").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .withColumn("score",
        col("tf").cast(DoubleType) * lit(n.toDouble) / col("df").cast(DoubleType))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .where(col("rk") <= k)
      .select(col("doc"), col("rk"), col("term"), col("tf"), col("df"), col("score"))
  }

  // PII detection/redaction lives in [[Pii]] (oracled by pii_scrub).

  /** C4-style GLOBAL line deduplication: drop every line that occurs
    * at least `minCount` times across the whole corpus (boilerplate —
    * nav bars, cookie banners, license headers — repeats verbatim
    * across pages; C4 removed any three-sentence span occurring more
    * than once, this is the line-granularity version), then
    * reconstruct each document from its surviving lines in order.
    * Documents whose every line was boilerplate come back as "".
    *
    * Shape at 100 TB: one map-combined count shuffle over lines, an
    * anti join against the (small — only lines that DID repeat) dup
    * set, and one reconstruction shuffle keyed by doc. Occurrence
    * counting is total (a line repeated within one document counts
    * toward the threshold), matching C4's corpus-occurrence rule.
    */
  def dropDuplicatedLines(df: org.apache.spark.sql.DataFrame,
                          textCol: String, idCol: String,
                          minCount: Long = 2L): org.apache.spark.sql.DataFrame = {
    val lines = df.select(col(idCol).as("doc"),
      posexplode(split(col(textCol), "\n")).as(Seq("ord", "line")))
    val dup = lines.groupBy(col("line"))
      .agg(count(lit(1)).as("c")).where(col("c") >= minCount)
      .select(col("line"))
    val kept = lines.join(dup, Seq("line"), "left_anti")
    val rebuilt = kept.groupBy(col("doc"))
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("ord"), col("line")))),
          x => x("line"))).as("cleaned"))
    df.select(col(idCol).as("doc"))
      .join(rebuilt, Seq("doc"), "left")
      .withColumn("cleaned", coalesce(col("cleaned"), lit("")))
  }

  /** Gopher-style document-quality rules (Rae et al. 2021,
    * arXiv:2112.11446 Table A1, adapted): word-count bounds, mean word
    * length in [3, 10], symbol-word ratio < 0.1, ≥ 80% words with an
    * alphabetic character, ≥ 2 distinct English stopwords. Emits the
    * per-rule signals plus the composite `keep` so a pipeline can
    * filter, or audit which rule fired.
    *
    * One pass, map-side: all counters fold over the token array in a
    * SINGLE `aggregate` higher-order call with a struct accumulator —
    * the split is evaluated once per row (separate size/filter
    * consumers would each inline their own copy of the split under
    * CollapseProject), there is no UDF, no explode, no shuffle.
    * English-centric by design, like the original: non-Latin scripts
    * fail the alphabetic rule and space-free text collapses to one
    * giant token — those documents FLAG false rather than error.
    */
  def gopherFlags(df: org.apache.spark.sql.DataFrame, textCol: String,
                  idCol: String): org.apache.spark.sql.DataFrame = {
    val stops = Seq("the", "and", "of", "to", "in")
    val zero = struct(lit(0L).as("n"), lit(0L).as("sumLen"),
      lit(0L).as("alpha"), lit(0L).as("sym"), lit(0L).as("mask"))
    def b(c: Column): Column = when(c, lit(1L)).otherwise(lit(0L))
    val folded = aggregate(split(col(textCol), " "), zero, (acc, w) => struct(
      (acc("n") + 1L).as("n"),
      (acc("sumLen") + length(w).cast(LongType)).as("sumLen"),
      (acc("alpha") + b(w.rlike("[A-Za-z]"))).as("alpha"),
      (acc("sym") + b(w.rlike("^#|\\.\\.\\.$"))).as("sym"),
      stops.zipWithIndex.foldLeft(acc("mask")) { case (m, (s, i)) =>
        m.bitwiseOR(when(w === s, lit(1L << i)).otherwise(lit(0L)))
      }.as("mask")))
    val nD = col("f.n").cast(DoubleType)
    df.select(col(idCol), folded.as("f"))
      .select(col(idCol),
        col("f.n").as("n_words"),
        (col("f.sumLen").cast(DoubleType) / nD).as("mean_word_len"),
        (col("f.sym").cast(DoubleType) / nD).as("symbol_ratio"),
        (col("f.alpha").cast(DoubleType) / nD).as("alpha_frac"),
        bit_count(col("f.mask")).cast(LongType).as("n_stop"))
      .withColumn("keep",
        col("n_words").between(10L, 100000L) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_ratio") < 0.1 &&
          col("alpha_frac") >= 0.8 &&
          col("n_stop") >= 2L)
  }

  /** 64-bit FNV-1a over UTF-8 — shared by SimHash/MinHash so
    * signatures are stable across runs and engines.
    */
  private[pipeline] def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val b = s.getBytes("UTF-8")
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Language ID by stopword-profile hit ratio — an n-gram-free
    * heuristic; `(code | "und", hit ratio)` struct with tuple-encoder
    * field names. Backed by the codegen'd
    * [[graft.functions.LangId]] expression (was a Scala UDF). NULL
    * text classifies as `("und", 0.0)` — the operator contract
    * predates the expression conversion (the retired UDF coerced null
    * to ""), so the null-coalesce is pinned HERE, not in the
    * null-propagating expression.
    */
  def langId(text: Column): Column =
    graft.functions.ColumnBridge.column(
      graft.functions.LangId(
        graft.functions.ColumnBridge.expression(coalesce(text, lit("")))))

  /** Rolling polynomial hash fingerprints of token w-shingles
    * (Rabin-Karp style) — the building block for content-defined
    * near-dup detection. Backed by the codegen'd
    * [[graft.functions.ShingleHashes]] expression (was a Scala UDF:
    * converter boxing per row plus every token FNV-hashed w times).
    * NULL text yields the EMPTY hash array, not NULL — a null-text
    * document must still flow through the dedup family (producing no
    * postings and no candidate pairs), matching the pre-conversion
    * UDF's null-to-"" coercion.
    */
  def shingleHashes(text: Column, w: Int): Column =
    graft.functions.HashFunctions.shingleHashes(coalesce(text, lit("")), w)
}
