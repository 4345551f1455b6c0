package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * The reference's flagship query is exact brute-force cosine retrieval
  * over float32 embeddings (reference vectordb.py:190-214: whole-corpus
  * `M @ q` then argsort-desc-topk). Here the per-row kernel is a tight
  * codegen'd loop over Parquet-native `ARRAY<FLOAT>` — no UDF boxing,
  * no `zip_with`/`aggregate` expression-tree interpretation — feeding
  * Spark's `TakeOrderedAndProject` (per-partition heap + driver merge),
  * which needs no shuffle of the vectors themselves: the plan is
  * scan → project(sim) → topk. That shape scales linearly with
  * executors at 100 TB.
  *
  * Numeric contract: accumulation is SEQUENTIAL (element order) in
  * DOUBLE, so results are bit-identical to any engine that folds
  * left-to-right in double — the DuckDB oracle SQL uses
  * `list_reduce(list_transform(...))` with explicit DOUBLE casts for
  * exactly this reason.
  */
object VectorKernels {
  @inline def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def dot(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += get(a, i, aF) * get(b, i, bF); i += 1 }
    s
  }

  def norm(a: ArrayData, aF: Boolean): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = get(a, i, aF); s += x * x; i += 1 }
    math.sqrt(s)
  }
}

private[functions] trait VectorTypeChecks { self: Expression =>
  protected def vectorChildren: Seq[Expression]

  protected def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = vectorChildren.find { c =>
      c.dataType match {
        case ArrayType(FloatType | DoubleType, _) => false
        case _ => true
      }
    }
    bad match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"${self.prettyName} expects ARRAY<FLOAT|DOUBLE>, got ${c.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  /** `getFloat(i)` / `getDouble(i)` accessor for codegen. */
  protected def acc(e: Expression, arr: String, i: String): String =
    if (elemIsFloat(e)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

/** Sequential-in-double dot product of two vectors. */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression with VectorTypeChecks {
  override protected def vectorChildren: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_d"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemIsFloat(left), elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${acc(left, a, i)} * ${acc(right, b, i)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sequential-in-double L2 norm. */
case class L2NormD(child: Expression)
    extends UnaryExpression with VectorTypeChecks {
  override protected def vectorChildren: Seq[Expression] = Seq(child)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2norm_d"

  override def nullSafeEval(a: Any): Any =
    VectorKernels.norm(a.asInstanceOf[ArrayData], elemIsFloat(child))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${acc(child, a, i)};
         |  $s += $x * $x;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Cosine similarity `dot(a,b) / (||a||·||b||)`, one pass, three
  * sequential double accumulators — bit-equal to computing the three
  * folds separately (each accumulator is independent and sequential).
  */
case class CosineSimD(left: Expression, right: Expression)
    extends BinaryExpression with VectorTypeChecks {
  override protected def vectorChildren: Seq[Expression] = Seq(left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim_d"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xF = elemIsFloat(left)
    val yF = elemIsFloat(right)
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = VectorKernels.get(x, i, xF)
      val yv = VectorKernels.get(y, i, yF)
      d += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    d / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $d = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${acc(left, a, i)};
         |  double $yv = ${acc(right, b, i)};
         |  $d += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $d / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine over int8 quantization codes (BinaryType): integer dot and
  * norm accumulators in LONG — exact for any realistic dim
  * (≤ dim·127² ≪ 2^63) and therefore bit-reproducible across engines —
  * with one double division at the end. Zero-norm inputs score 0.0
  * (matching the SQL oracle's CASE).
  *
  * Unlike [[CosineSimD]] — whose min-length fold is a deliberate
  * contract so Matryoshka-truncated vectors compare against full-dim
  * ones — a length mismatch between two code vectors can only mean a
  * corrupt or mixed-dim index row, so it yields NULL rather than a
  * plausible score over the shared prefix.
  */
case class Int8CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY code vectors, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "int8_cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) return null
    val n = x.length
    var d = 0L; var nx = 0L; var ny = 0L
    var i = 0
    while (i < n) {
      val xv = x(i).toLong
      val yv = y(i).toLong
      d += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0L || ny == 0L) 0.0
    else d.toDouble / (math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.length;
         |  long $d = 0L; long $nx = 0L; long $ny = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $xv = (long) $a[$i];
         |    long $yv = (long) $b[$i];
         |    $d += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |  }
         |  ${ev.value} = ($nx == 0L || $ny == 0L) ? 0.0 :
         |    ((double) $d) / (java.lang.Math.sqrt((double) $nx)
         |      * java.lang.Math.sqrt((double) $ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Per-vector symmetric int8 quantization codes as BINARY —
  * `scale = max|v|/127`, `code_i = floor(v_i/scale + 0.5)` (explicit
  * floor(+0.5) so every engine rounds identically; all-zero vectors
  * quantize to zero codes). Replaces a Scala UDF: no Seq[Float]
  * converter boxing per row on the quantized-ANN hot path (corpus
  * quantization in int8 top-k, IVF index writes/search).
  */
case class Int8Codes(child: Expression)
    extends UnaryExpression with VectorTypeChecks {
  override protected def vectorChildren: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "int8_codes"

  override def nullSafeEval(a: Any): Any =
    Int8Codes.compute(a.asInstanceOf[ArrayData], elemIsFloat(child))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val isF = elemIsFloat(child)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Int8Codes.compute($a, $isF);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Int8Codes {
  /** Shared kernel for eval and generated code — bit-identical to the
    * retired UDF's math (toDouble per element, one floor per code).
    */
  def compute(arr: ArrayData, isFloat: Boolean): Array[Byte] = {
    val n = arr.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(VectorKernels.get(arr, i, isFloat))
      if (a > mx) mx = a
      i += 1
    }
    val out = new Array[Byte](n)
    if (mx != 0.0) {
      val s = mx / 127.0
      i = 0
      while (i < n) {
        out(i) = math.floor(VectorKernels.get(arr, i, isFloat) / s + 0.5).toByte
        i += 1
      }
    }
    out
  }
}

/** Signed-random-hyperplane LSH signature of a vector: bit i =
  * sign(dot(v, plane_i)). Plane coefficients are splitmix64 dyadic
  * rationals (deterministic by construction, engine-replayable) and
  * ride along as a flattened codegen reference object. Replaces the
  * per-row UDFs on the LSH bucketing paths (corpus + query hashing in
  * lshTopK, block keys in embedding near-dup). `bands <= 0` emits the
  * whole signature as a single-element array; otherwise per-band
  * sub-keys of `bitsPerBand` bits each.
  */
case class HyperplaneKeys(child: Expression, dim: Int, bands: Int,
                          bitsPerBand: Int, seed: Long)
    extends UnaryExpression with VectorTypeChecks {
  override protected def vectorChildren: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_keys"

  private def bits: Int = if (bands <= 0) bitsPerBand else bands * bitsPerBand

  @transient private lazy val planes: Array[Double] =
    HyperplaneKeys.planes(bits, dim, seed)

  override def nullSafeEval(a: Any): Any =
    HyperplaneKeys.compute(a.asInstanceOf[ArrayData], elemIsFloat(child),
      planes, dim, bands, bitsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("planes", planes, "double[]")
    val isF = elemIsFloat(child)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = graft.functions.HyperplaneKeys.compute(
         |  $a, $isF, $p, $dim, $bands, $bitsPerBand);""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HyperplaneKeys {
  @inline private def splitmix64(x0: Long): Long = Splitmix64.mix(x0)

  /** Coefficients in [-1, 1) flattened bit-major: plane b's component
    * i at index b·dim + i — identical values to the driver-side
    * generator the Python oracle replays.
    */
  def planes(bits: Int, dim: Int, seed: Long): Array[Double] =
    Array.tabulate(bits * dim) { k =>
      ((splitmix64(seed + k) >>> 11).toDouble /
        (1L << 53).toDouble) * 2.0 - 1.0
    }

  /** Shared kernel for eval and generated code. */
  def compute(arr: ArrayData, isFloat: Boolean, planes: Array[Double],
              dim: Int, bands: Int, bitsPerBand: Int): ArrayData = {
    val bits = if (bands <= 0) bitsPerBand else bands * bitsPerBand
    var sig = 0L
    var b = 0
    val n = math.min(dim, arr.numElements())
    while (b < bits) {
      var s = 0.0
      var i = 0
      while (i < n) {
        s += planes(b * dim + i) * VectorKernels.get(arr, i, isFloat)
        i += 1
      }
      if (s >= 0) sig |= (1L << b)
      b += 1
    }
    val out =
      if (bands <= 0) Array(sig)
      else Array.tabulate(bands)(band =>
        (sig >>> (band * bitsPerBand)) & ((1L << bitsPerBand) - 1))
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** One-pass L2 normalization producing ARRAY<FLOAT> (store contract,
  * reference vectordb.py:81-86) or ARRAY<DOUBLE> (oracle-exact math).
  * A `transform(v, x => x / l2norm(v))` column does the same thing
  * O(d²): the norm subexpression is re-evaluated per element (no CSE
  * inside higher-order-function lambdas).
  */
case class L2Normalize(child: Expression, asFloat: Boolean)
    extends UnaryExpression with VectorTypeChecks
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override protected def vectorChildren: Seq[Expression] = Seq(child)
  override def dataType: DataType =
    ArrayType(if (asFloat) FloatType else DoubleType, containsNull = false)
  override def prettyName: String = "l2_normalize"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val isF = elemIsFloat(child)
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = VectorKernels.get(arr, i, isF); s += x * x; i += 1 }
    val norm = math.sqrt(s)
    if (asFloat) {
      val out = new Array[Float](n)
      i = 0
      while (i < n) {
        out(i) = (VectorKernels.get(arr, i, isF) / norm).toFloat; i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    } else {
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = VectorKernels.get(arr, i, isF) / norm; i += 1 }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Binary-quantization (sign-bit) codes as BINARY — bit j of byte
  * j/8 is set iff v_j > 0 (strict: a zero component codes 0, same
  * convention as the SimHash family). ceil(d/8) bytes per vector:
  * 32× under float32 at any dimension, the coarsest tier of the
  * layout family (float → int8 4× → PQ m-byte → sign bits). The
  * asymmetric estimator is deliberately NOT used: the symmetric
  * Hamming shortlist (query binarized too) keeps the candidate
  * kernel at one XOR+popcount per 64 dims, and the exact rescore on
  * oversampled survivors restores the ranking — the standard BQ +
  * rescore design (e.g. Qdrant binary quantization).
  */
case class SignBits(child: Expression)
    extends UnaryExpression with VectorTypeChecks {
  override protected def vectorChildren: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sign_bits"

  override def nullSafeEval(a: Any): Any =
    SignBits.compute(a.asInstanceOf[ArrayData], elemIsFloat(child))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val isF = elemIsFloat(child)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SignBits.compute($a, $isF);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SignBits {
  /** Shared kernel for eval and generated code. Little-endian bit
    * order within each byte (bit j of byte j/8 = component j) — the
    * Python golden mirror packs identically.
    */
  def compute(arr: ArrayData, isFloat: Boolean): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte]((n + 7) / 8)
    var i = 0
    while (i < n) {
      if (VectorKernels.get(arr, i, isFloat) > 0.0)
        out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }
}

/** Hamming distance between two BINARY bit strings (XOR + popcount,
  * 8 bytes per step). Null on length mismatch — mixed-dimension
  * codes are a wiring bug, not a distance.
  */
case class BitHamming(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY bit strings, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bit_hamming"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    if (x.length != y.length) null else BitHamming.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.BitHamming.compute($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BitHamming {
  def compute(x: Array[Byte], y: Array[Byte]): Int = {
    val n = x.length
    var d = 0
    var i = 0
    while (i + 8 <= n) {
      var xv = 0L; var yv = 0L
      var j = 0
      while (j < 8) {
        xv |= (x(i + j) & 0xFFL) << (8 * j)
        yv |= (y(i + j) & 0xFFL) << (8 * j)
        j += 1
      }
      d += java.lang.Long.bitCount(xv ^ yv)
      i += 8
    }
    while (i < n) {
      d += java.lang.Integer.bitCount((x(i) ^ y(i)) & 0xFF)
      i += 1
    }
    d
  }
}

/** Column-level API over the vector expressions. */
object VectorFunctions {
  import org.apache.spark.sql.functions._

  def dotD(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductD(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def l2NormD(a: Column): Column =
    ColumnBridge.column(L2NormD(ColumnBridge.expression(a)))

  def cosineSimD(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimD(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Cosine over BINARY int8 code vectors (codegen'd integer kernel). */
  def int8CosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(Int8CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Symmetric int8 quantization codes (codegen'd, see [[Int8Codes]]). */
  def int8Codes(a: Column): Column =
    ColumnBridge.column(Int8Codes(ColumnBridge.expression(a)))

  /** Sign-bit binary-quantization codes (codegen'd, see [[SignBits]]). */
  def signBits(a: Column): Column =
    ColumnBridge.column(SignBits(ColumnBridge.expression(a)))

  /** Hamming distance over BINARY bit strings (codegen'd popcount). */
  def bitHamming(a: Column, b: Column): Column =
    ColumnBridge.column(BitHamming(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Vector literal for a query embedding. */
  def vecLit(v: Array[Float]): Column = typedLit(v.toSeq)

  def vecLitD(v: Array[Double]): Column = typedLit(v.toSeq)

  /** L2-normalize to ARRAY<DOUBLE> (oracle-exact double math). */
  def l2NormalizeD(a: Column): Column =
    ColumnBridge.column(L2Normalize(ColumnBridge.expression(a), asFloat = false))

  /** L2-normalize keeping the store's float32 contract
    * (reference vectordb.py:81-86: normalize-then-store-float32).
    */
  def l2NormalizeF(a: Column): Column =
    ColumnBridge.column(L2Normalize(ColumnBridge.expression(a), asFloat = true))

  /** Matryoshka-style truncation to the first `dim` components
    * (reference vectordb.py:83 `vector[:dim]`).
    */
  def truncateDim(a: Column, dim: Int): Column = slice(a, 1, dim)
}
