package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** splitmix64's finalizer as a codegen'd Catalyst expression.
  *
  * This is the engine's portable per-row randomness primitive: pure
  * integer mixing (Steele et al., "Fast splittable pseudorandom number
  * generators", OOPSLA 2014 — same finalizer the JDK's
  * SplittableRandom uses), so any engine replays it bit-for-bit from
  * masked 64-bit arithmetic — no RNG stream ordering, no libm. The
  * deterministic sampling / LSH paths already use the identical mix
  * driver-side ([[graft.pipeline.Similarity]], [[graft.pipeline.Ivf]]);
  * this expression brings it to per-row plan code without a UDF.
  * Wrap-around multiply/add cannot be spelled in plan arithmetic under
  * ANSI mode (it throws on overflow) — a native expression sidesteps
  * that and stays inside whole-stage codegen.
  */
case class Splitmix64(child: Expression, seed: Long = 0L)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BIGINT, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "splitmix64"

  override def nullSafeEval(x: Any): Any =
    Splitmix64.mix(x.asInstanceOf[Long] + seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val z = ctx.freshName("z")
      // the seed is folded in HERE (Java long arithmetic wraps) — a
      // plan-level `key + seed` Add would throw on overflow in ANSI
      // mode, breaking the wrap-around contract the Python mirror
      // ((key + seed) & M64) replays
      s"""
         |long $z = $x + ${seed}L + 0x9e3779b97f4a7c15L;
         |$z = ($z ^ ($z >>> 30)) * 0xbf58476d1ce4e5b9L;
         |$z = ($z ^ ($z >>> 27)) * 0x94d049bb133111ebL;
         |${ev.value} = $z ^ ($z >>> 31);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Splitmix64 {
  /** SQL-surface builder shared by GraftSql and GraftExtensions:
    * `splitmix64(key)` or `splitmix64(key, seedLiteral)`. The seed
    * must be a literal — it parameterizes generated code — and wrong
    * arity fails analysis instead of silently mixing with seed 0.
    */
  def fromArgs(exprs: Seq[Expression]): Splitmix64 = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    exprs match {
      case Seq(key) => Splitmix64(key)
      case Seq(key, Literal(s, LongType)) => Splitmix64(key, s.asInstanceOf[Long])
      // SQL integer literals parse as INT (or smaller) unless suffixed
      // `L` — widen any integral literal seed instead of rejecting it
      case Seq(key, Literal(s, IntegerType)) => Splitmix64(key, s.asInstanceOf[Int].toLong)
      case Seq(key, Literal(s, ShortType)) => Splitmix64(key, s.asInstanceOf[Short].toLong)
      case Seq(key, Literal(s, ByteType)) => Splitmix64(key, s.asInstanceOf[Byte].toLong)
      case Seq(_, other) => throw new IllegalArgumentException(
        s"splitmix64 seed must be an integral literal, got ${other.sql}")
      case _ => throw new IllegalArgumentException(
        s"splitmix64 expects 1 or 2 arguments, got ${exprs.size}")
    }
  }

  /** The shared scalar kernel (used by the expression, driver-side
    * samplers, and tests — one definition, one truth).
    */
  @inline def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** mix(x) folded to an exact dyadic rational in [0, 1): the top 53
    * bits over 2^53 — representable exactly in IEEE double, so the
    * comparison `unitUniform(x) < p` is bit-identical in any engine
    * that replays the integer mix.
    */
  @inline def unitUniform(x0: Long): Double =
    (mix(x0) >>> 11).toDouble / (1L << 53).toDouble
}

/** Rolling w-gram shingle hashes of a whitespace-tokenized string —
  * the candidate keys of the whole dedup family (Jaccard postings,
  * prefix filtering, MinHash input, decontamination). This replaces a
  * Scala UDF on the hottest pipeline path: no Catalyst↔Scala
  * converter boxing per row, and each token is FNV-hashed ONCE with
  * windows folding over the per-token hashes — the UDF re-hashed
  * every token w times (identical results, w× less hashing).
  *
  * Token semantics are exactly `String.split(" ")` (keeps leading/
  * interior empties, drops trailing) — the contract every golden and
  * DuckDB `string_split` oracle is built on.
  */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, INT), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(t: Any, w: Any): Any =
    ShingleHashes.compute(t.toString, w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w) =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($t.toString(), $w);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ShingleHashes {
  private val FnvPrime = 1099511628211L

  /** 64-bit FNV-1a over UTF-8 bytes (the engine's string hash). */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val b = s.getBytes("UTF-8")
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  /** Shared kernel for eval and generated code. */
  def compute(text: String, w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = text.split(" ")
    val empty = w <= 0 || toks.length < w
    val out =
      if (empty) Array.empty[Long]
      else {
        val th = new Array[Long](toks.length)
        var i = 0
        while (i < toks.length) { th(i) = fnv1a64(toks(i)); i += 1 }
        val n = toks.length - w + 1
        val hs = new Array[Long](n)
        i = 0
        while (i < n) {
          var h = 0L
          var j = i
          while (j < i + w) { h = h * FnvPrime + th(j); j += 1 }
          hs(i) = h
          i += 1
        }
        hs
      }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** 64-bit SimHash signature of a whitespace-tokenized string
  * (Charikar 2002): per-token FNV-1a hashes bit-vote into 64
  * counters, the sign vector is the signature. Near-duplicate ⇔ small
  * Hamming distance; the dedup operators band the signature into
  * 16-bit sub-keys for equi-join candidates. Native expression — one
  * String in / long out per row on both the batch and streaming
  * near-dup ingest paths, no UDF converter in the scan. Empty tokens
  * are skipped (split(" ") artifacts carry no content signal).
  */
case class Simhash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(t: Any): Any = Simhash64.compute(t.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.Simhash64.compute($t.toString());")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Simhash64 {
  /** Shared kernel for eval and generated code. */
  def compute(text: String): Long = {
    val toks = text.split(" ")
    val acc = new Array[Int](64)
    var k = 0
    while (k < toks.length) {
      val t = toks(k)
      if (t.nonEmpty) {
        val h = ShingleHashes.fnv1a64(t)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
          i += 1
        }
      }
      k += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }
}

/** MinHash-LSH band keys straight from a shingle-hash array in ONE
  * pass per row: the minhash signature (bands×rows universal hashes
  * `(a·x + b) mod 2^61-1`) is computed and immediately folded into
  * `bands` FNV bucket keys — emitting the signature as its own column
  * looks natural but CollapseProject inlines the computation into
  * every band element, re-running the minhash bands× per row. Native
  * expression: the hash array is read directly from ArrayData (the
  * UDF predecessor copied it to Array[Long] per row), and the seeded
  * (a, b) parameter table rides along as a codegen reference object.
  *
  * Returns an empty array for empty input (documents with no
  * shingles produce no band rows after posexplode).
  */
case class MinhashBandKeys(child: Expression, bands: Int, rows: Int,
                           seed: Long) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects ARRAY<BIGINT>, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_keys"

  @transient private lazy val params: Array[Long] =
    MinhashBandKeys.params(bands * rows, seed)

  override def nullSafeEval(a: Any): Any =
    MinhashBandKeys.compute(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      params, bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("mhParams", params, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinhashBandKeys.compute($a, $p, $bands, $rows);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinhashBandKeys {
  private val MersenneP = (1L << 61) - 1

  /** Seeded universal-hash parameters, flattened (a_i at 2i, b_i at
    * 2i+1) — java.util.Random's sequence, replayed identically by the
    * Python golden generator.
    */
  def params(numHashes: Int, seed: Long): Array[Long] = {
    val rnd = new java.util.Random(seed)
    val out = new Array[Long](numHashes * 2)
    var i = 0
    while (i < numHashes) {
      out(2 * i) = math.abs(rnd.nextLong()) % (MersenneP - 1) + 1
      out(2 * i + 1) = math.abs(rnd.nextLong()) % MersenneP
      i += 1
    }
    out
  }

  /** `(a·x) mod (2^61-1)` via 128-bit multiply + Mersenne folding:
    * with `prod = hi·2^64 + lo`, `2^64 ≡ 8` and `2^61 ≡ 1 (mod p)`,
    * so `prod ≡ hi·8 + (lo >>> 61) + (lo & p)`. `hi < 2^58`, so no
    * intermediate overflows.
    */
  @inline private def mulModP(a: Long, x: Long): Long = {
    val hi = java.lang.Math.multiplyHigh(a, x)
    val lo = a * x
    var r = (hi << 3) + (lo >>> 61) + (lo & MersenneP)
    r = (r & MersenneP) + (r >>> 61)
    if (r >= MersenneP) r - MersenneP else r
  }

  /** Shared kernel for eval and generated code. */
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData,
              params: Array[Long], bands: Int,
              rows: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val out =
      if (n == 0) Array.empty[Long]
      else {
        val nh = bands * rows
        val sig = new Array[Long](nh)
        var s = 0
        while (s < nh) {
          val a = params(2 * s)
          val b = params(2 * s + 1)
          var mn = Long.MaxValue
          var i = 0
          while (i < n) {
            val x = java.lang.Long.remainderUnsigned(arr.getLong(i), MersenneP)
            var hv = mulModP(a, x) + b
            if (hv >= MersenneP) hv -= MersenneP
            if (hv < mn) mn = hv
            i += 1
          }
          sig(s) = mn
          s += 1
        }
        Array.tabulate(bands) { bIdx =>
          var k = 0xcbf29ce484222325L ^ bIdx
          var i = bIdx * rows
          while (i < (bIdx + 1) * rows) {
            k ^= sig(i); k *= 0x100000001b3L; i += 1
          }
          k
        }
      }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Language ID by stopword-profile hit ratio — an n-gram-free
  * heuristic over a small built-in function-word table; best-scoring
  * language code or "und" with the hit ratio. Struct-returning native
  * expression (fields `_1` lang, `_2` score — the tuple-encoder names
  * its UDF predecessor produced, so downstream `pred._1` projections
  * are unchanged). Ties break toward the lexicographically larger
  * code, matching the retired UDF's maxBy on (score, lang).
  */
case class LangId(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = StructType(Seq(
    StructField("_1", StringType, nullable = false),
    StructField("_2", DoubleType, nullable = false)))
  override def prettyName: String = "lang_id"

  override def nullSafeEval(t: Any): Any = LangId.compute(t.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.LangId.compute($t.toString());")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object LangId {
  /** Function-word profiles (10 per language). */
  val Profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "of", "and", "to", "in", "is", "for", "that", "it"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr" -> Set("le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"),
    "es" -> Set("el", "la", "los", "y", "es", "no", "un", "una", "para", "en"),
    "zh" -> Set("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Shared kernel for eval and generated code. */
  def compute(text: String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    var lang = "und"
    var score = 0.0
    if (toks.nonEmpty) {
      Profiles.foreach { case (l, p) =>
        val s = toks.count(p.contains).toDouble / toks.length
        if (s > score || (s == score && s > 0.0 && l > lang)) {
          lang = l; score = s
        }
      }
      if (score == 0.0) lang = "und"
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(lang),
        score))
  }
}

/** Exact distinct-set Jaccard similarity of two ARRAY<BIGINT> hash
  * sets — the verify kernel of the whole dedup family (prefix-filter
  * and MinHash candidate verification). Replaces the last per-row
  * Scala UDFs on the dedup surface: the verify stage runs only on
  * candidate pairs, but a codegen expression drops the
  * Catalyst↔Scala converter boxing and keeps the stage inside
  * whole-stage codegen. Sort-merge kernel (copies + two
  * `Arrays.sort`), counting DISTINCT intersection and union — inputs
  * need not be sorted or deduplicated, matching both retired lambdas
  * (one took distinct arrays, one built sets first; the arithmetic
  * `inter / (|A| + |B| − inter)` over distinct counts is identical).
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
          s"${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSim.compute(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaccardSim.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaccardSim {
  /** Distinct count of a sorted array. */
  @inline private def distinct(a: Array[Long]): Int = {
    if (a.length == 0) return 0
    var d = 1
    var i = 1
    while (i < a.length) { if (a(i) != a(i - 1)) d += 1; i += 1 }
    d
  }

  /** Shared kernel for eval and generated code. */
  def compute(aa: org.apache.spark.sql.catalyst.util.ArrayData,
              bb: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val a = aa.toLongArray()
    val b = bb.toLongArray()
    java.util.Arrays.sort(a)
    java.util.Arrays.sort(b)
    val da = distinct(a)
    val db = distinct(b)
    // merge over sorted arrays, counting distinct common values
    var i = 0
    var j = 0
    var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else {
        inter += 1
        val v = a(i)
        while (i < a.length && a(i) == v) i += 1
        while (j < b.length && b(j) == v) j += 1
      }
    }
    val union = da + db - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }
}

/** Per-document n-gram repetition statistics (Gopher-style quality
  * signals, Rae et al. 2021) in ONE pass over the token array:
  * `top_frac` = occurrences of the most frequent n-gram / total
  * n-grams, `dup_frac` = fraction of n-gram occurrences whose gram
  * appears ≥ 2× in the document. Both are PER-DOCUMENT numbers, so
  * computing them map-side with a per-row gram hashmap is the
  * scale-correct plan — the relational predecessor exploded every
  * gram into a corpus-wide (doc, gram) aggregation plus a join back,
  * shipping per-document statistics through four shuffles. Grams are
  * exact strings (space-joined tokens — injective, since tokens from
  * a single-space split cannot contain spaces), not hashes, so the
  * result is bit-identical to the string-grouped relational oracle.
  * Rounding replays Spark's `round(x, 4)` (BigDecimal HALF_UP) that
  * the oracle was validated against. Fewer than n tokens → (0, 0),
  * matching the old left-join + coalesce contract.
  */
case class GramRepetition(child: Expression, n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects n >= 1, got $n")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects ARRAY<STRING>, got ${other.sql}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("top_frac", DoubleType, nullable = false),
    StructField("dup_frac", DoubleType, nullable = false)))
  override def prettyName: String = "gram_repetition"

  override def nullSafeEval(a: Any): Any =
    GramRepetition.compute(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.GramRepetition.compute($a, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object GramRepetition {
  /** Spark's `round(x, 4)` for doubles: decimal HALF_UP. */
  @inline private def round4(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Shared kernel for eval and generated code. Linear in tokens:
    * one StringBuilder join and one hashmap merge per gram.
    */
  def compute(arr: org.apache.spark.sql.catalyst.util.ArrayData,
              n: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val sz = arr.numElements()
    var top = 0.0
    var dup = 0.0
    if (sz >= n) {
      val toks = new Array[String](sz)
      var i = 0
      while (i < sz) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
      val total = sz - n + 1
      val counts = new java.util.HashMap[String, Integer](total * 2)
      i = 0
      while (i < total) {
        val sb = new java.lang.StringBuilder(toks(i))
        var k = 1
        while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
        counts.merge(sb.toString, Integer.valueOf(1),
          (x: Integer, y: Integer) => Integer.valueOf(x.intValue + y.intValue))
        i += 1
      }
      var mx = 0L
      var dupOcc = 0L
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next().longValue
        if (c > mx) mx = c
        if (c >= 2) dupOcc += c
      }
      top = round4(mx.toDouble / total.toDouble)
      dup = round4(dupOcc.toDouble / total.toDouble)
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](top, dup))
  }
}

/** Recursive-bisection chunk count of a text (the F8 chunker's
  * partition of the line sequence under a byte budget,
  * [[graft.core.Chunker.chunkContent]]) as a codegen'd expression —
  * the chunk-statistics scan over a corpus was the last per-row Scala
  * UDF on a table scan. The kernel is the golden-checked chunker
  * itself; only the converter boxing goes away.
  */
case class ChunkCount(child: Expression, maxBytes: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "chunk_count"

  override def nullSafeEval(t: Any): Any =
    graft.core.Chunker.chunkContent(t.toString, maxBytes).length.toLong

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = (long) graft.core.Chunker.chunkContent(
         |  $t.toString(), ${maxBytes}L).length();""".stripMargin)

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Membership probe against a pre-built Bloom filter, as a codegen'd
  * expression: the sketch rides along as a codegen reference object
  * (inside the task binary, which Spark broadcasts once per stage), so
  * the probe runs inside whole-stage codegen with no per-row UDF
  * converter — this sits on the TRAINING-side scan of Bloom-prefiltered
  * decontamination ([[graft.pipeline.Dedup.crossJaccardPairsBloom]]),
  * the single biggest scan in the system at 100 TB. No false negatives
  * (Bloom contract), so callers may use it as a lossless prefilter in
  * front of an equi-join.
  */
case class BloomMightContain(child: Expression,
                             bloom: org.apache.spark.util.sketch.BloomFilter)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BIGINT, got ${child.dataType.sql}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(h: Any): Any =
    bloom.mightContainLong(h.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val b = ctx.addReferenceObj("bloom", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, h => s"${ev.value} = $b.mightContainLong($h);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Column-level API over the hash expressions. The seed rides INSIDE
  * the expression: wrap-around `key + seed` cannot be written as plan
  * arithmetic under ANSI mode (Add throws on Long overflow), and ids
  * near Long.MaxValue are legitimate for hash-derived keys.
  */
object HashFunctions {
  def splitmix64(x: Column, seed: Long = 0L): Column =
    ColumnBridge.column(Splitmix64(ColumnBridge.expression(x), seed))

  /** Deterministic per-row uniform in [0, 1) from a long key: exact
    * dyadic rational (top 53 bits / 2^53) of the splitmix64 mix.
    */
  def unitUniform(key: Column, seed: Long = 0L): Column = {
    import org.apache.spark.sql.functions._
    shiftrightunsigned(splitmix64(key, seed), 11)
      .cast(DoubleType) / lit((1L << 53).toDouble)
  }

  /** Rolling w-gram shingle hashes (codegen'd, see [[ShingleHashes]]). */
  def shingleHashes(text: Column, w: Int): Column = {
    import org.apache.spark.sql.functions.lit
    ColumnBridge.column(ShingleHashes(
      ColumnBridge.expression(text), ColumnBridge.expression(lit(w))))
  }

  /** 64-bit SimHash signature (codegen'd, see [[Simhash64]]). */
  def simhash64(text: Column): Column =
    ColumnBridge.column(Simhash64(ColumnBridge.expression(text)))

  /** Bloom membership probe (codegen'd, see [[BloomMightContain]]). */
  def bloomMightContain(h: Column,
                        bloom: org.apache.spark.util.sketch.BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(h), bloom))

  /** Recursive-bisection chunk count (codegen'd, see [[ChunkCount]]). */
  def chunkCount(text: Column, maxBytes: Long): Column =
    ColumnBridge.column(ChunkCount(ColumnBridge.expression(text), maxBytes))

  /** Per-document n-gram repetition stats as a struct
    * `(top_frac, dup_frac)` (codegen'd, see [[GramRepetition]]).
    */
  def gramRepetition(tokens: Column, n: Int): Column =
    ColumnBridge.column(GramRepetition(ColumnBridge.expression(tokens), n))

  /** Exact distinct-set Jaccard of two hash arrays (codegen'd, see
    * [[JaccardSim]]).
    */
  def jaccardSim(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
