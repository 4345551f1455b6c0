package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Fixed-point first+second vector moments:
  * `fixed_moments(vec, dim, scale)` accumulates, over all rows of the
  * group, the row count, the per-component sums, and the upper
  * triangle of the Gram matrix Σ x·xᵀ — every term carried as
  * `rint(value · scale)` in a LONG. Integer addition is associative
  * and commutative, so the aggregate is BIT-DETERMINISTIC across
  * partitionings, executor counts, and merge orders — the property
  * that makes a full-corpus distributed trainer (PCA's covariance,
  * [[graft.pipeline.Pca.trainDistributed]]) reproducible and
  * oracle-able, where double accumulation would drift with Spark's
  * combine order.
  *
  * Buffer layout (`1 + dim + dim·(dim+1)/2` longs): `[count,
  * sum_0..sum_{dim-1}, gram(0,0), gram(0,1), …, gram(dim-1,dim-1)]`
  * (gram upper-tri in row-major order). Map-side partials hold ONE
  * such buffer per partition (≈16 KB at dim 64); only those buffers
  * shuffle. Rows shorter than `dim` are zero-padded; longer rows are
  * truncated; all-null/absent AND zero-length vectors are skipped
  * (not counted — an empty array counted as a zero-padded row would
  * silently bias the mean toward zero; the Python oracle mirrors the
  * skip).
  *
  * Overflow envelope at the default scale 2^20: |x·x| ≤ 4 supports
  * ~2×10¹² rows per group (4 · 2^20 · 2e12 < 2^63); embedding inputs
  * are unit-scale. `rint` (round-half-even) rather than Spark SQL's
  * BigDecimal half-up `round`: this is a hot per-row kernel
  * (dim²/2 roundings per row) and rint is a single IEEE instruction
  * the Python oracle replays exactly (`round()` on a float is
  * half-even on the same double).
  */
case class FixedMoments(
    vecExpr: Expression,
    dim: Int,
    scale: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim >= 1, "dim must be positive")
  require(scale > 0.0, "scale must be positive")

  private val gramBase = 1 + dim
  private val bufLen = 1 + dim + dim * (dim + 1) / 2

  private lazy val elemIsFloat: Boolean = vecExpr.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"fixed_moments needs ARRAY<FLOAT|DOUBLE>, got $t")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = vecExpr.eval(input)
    if (v != null && v.asInstanceOf[ArrayData].numElements() > 0) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dim, arr.numElements())
      val x = new Array[Double](n)
      var i = 0
      while (i < n) {
        x(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      buf(0) += 1L
      i = 0
      while (i < n) {
        buf(1 + i) += math.rint(x(i) * scale).toLong
        var j = i
        // upper-tri row-major offset of (i, i): rows 0..i-1 contribute
        // (dim - r) cells each
        var o = gramBase + i * dim - i * (i - 1) / 2
        while (j < n) {
          buf(o + (j - i)) += math.rint(x(i) * x(j) * scale).toLong
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bufLen * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < bufLen) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](bufLen)
    var i = 0
    while (i < bufLen) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(vecExpr)
  override def prettyName: String = "fixed_moments"

  override def withNewMutableAggBufferOffset(newOffset: Int): FixedMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FixedMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vecExpr = newChildren(0))
}

/** Packed per-group vector sum of PRE-ROUNDED fixed-point longs:
  * `fixed_vec_sum(lv, dim)` accumulates, over all rows of the group,
  * the row count and the per-component sums of an ARRAY<LONG> column
  * — the per-cluster fold of the distributed k-means trainers
  * ([[graft.pipeline.Ivf.trainDistributed]]'s Lloyd's iteration).
  * Rounding stays UPSTREAM in the plan (Spark's own
  * `round(x * F) cast long` inside a `transform`), so the aggregate
  * adds exactly the longs the per-(cluster, pos) explode-and-sum
  * shape produced — bit-identical by integer associativity — while
  * the driver receives nlist packed rows instead of nlist × dim
  * (cluster, pos, sum, count) Rows (~17M at nlist 2^16 × dim 256;
  * the r13 flat-fold driver bottleneck), and nothing explodes:
  * corpus rows stream through one map-side buffer per (partition,
  * cluster) instead of corpus × dim exploded rows.
  *
  * Buffer layout (`1 + dim` longs): `[count, sum_0..sum_{dim-1}]`.
  * Rows shorter than `dim` zero-pad; longer rows truncate; null
  * ELEMENTS add nothing (their row still counts — the explode
  * shape's `count(lit(1))` at pos 0 counted it); all-null and
  * ZERO-LENGTH arrays are skipped entirely (not counted) — exactly
  * the rows the explode shape never saw, and the rule the Python
  * trainer mirrors share (`if not v: continue`).
  */
case class FixedVecSum(
    vecExpr: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim >= 1, "dim must be positive")

  private val bufLen = 1 + dim

  // deferred like FixedMoments' elemIsFloat: the child may be
  // unresolved at construction time during analysis
  private lazy val typeChecked: Unit = vecExpr.dataType match {
    case ArrayType(LongType, _) => ()
    case t => throw new IllegalArgumentException(
      s"fixed_vec_sum needs ARRAY<LONG> (pre-rounded fixed-point), got $t")
  }

  override def createAggregationBuffer(): Array[Long] = {
    typeChecked
    new Array[Long](bufLen)
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = vecExpr.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dim, arr.numElements())
      if (arr.numElements() > 0) {
        buf(0) += 1L
        var i = 0
        while (i < n) {
          if (!arr.isNullAt(i)) buf(1 + i) += arr.getLong(i)
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bufLen) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bufLen * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < bufLen) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](bufLen)
    var i = 0
    while (i < bufLen) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(vecExpr)
  override def prettyName: String = "fixed_vec_sum"

  override def withNewMutableAggBufferOffset(newOffset: Int): FixedVecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FixedVecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vecExpr = newChildren(0))
}

object FixedVecSum {
  /** Column API: `fixedVecSum(lv, dim)` as an aggregate column over a
    * pre-rounded ARRAY<LONG>.
    */
  def fixedVecSum(lv: Column, dim: Int): Column =
    ColumnBridge.column(
      FixedVecSum(ColumnBridge.expression(lv), dim).toAggregateExpression())

  /** Decode one aggregate result: (count, per-component sums). */
  def decode(buf: Seq[Long], dim: Int): (Long, Array[Long]) = {
    require(buf.length == 1 + dim,
      s"vec-sum buffer length ${buf.length} does not match dim $dim")
    (buf.head, buf.tail.toArray)
  }
}

object FixedMoments {
  /** The default fixed-point scale: 2^20 trades ~1e-6 per-row
    * granularity (far below covariance estimation noise) for a
    * ~2×10¹² rows-per-group overflow envelope at |x·x| ≤ 4.
    */
  val DefaultScale: Double = (1L << 20).toDouble

  /** Column API: `fixedMoments(vec, dim)` as an aggregate column. */
  def fixedMoments(vec: Column, dim: Int,
                   scale: Double = DefaultScale): Column =
    ColumnBridge.column(
      FixedMoments(ColumnBridge.expression(vec), dim, scale)
        .toAggregateExpression())

  /** Decode one aggregate result: (count, sums, upper-tri gram). */
  def decode(buf: Seq[Long], dim: Int): (Long, Array[Long], Array[Long]) = {
    require(buf.length == 1 + dim + dim * (dim + 1) / 2,
      s"moments buffer length ${buf.length} does not match dim $dim")
    (buf.head, buf.slice(1, 1 + dim).toArray,
      buf.drop(1 + dim).toArray)
  }
}
