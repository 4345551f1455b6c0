package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PCA for embedding pipelines — the principled counterpart to
  * Matryoshka truncation (`truncateDim` keeps the FIRST d components;
  * PCA keeps the d highest-variance directions): center on the sample
  * mean, project onto the top-k eigenvectors of the sample covariance.
  * Standard uses at 100 TB scale: shrink vectors before ANN indexing,
  * decorrelate before product quantization, visualize corpus drift.
  *
  * Train is the bounded-driver-fold shape every quantizer in this repo
  * uses (the faiss design, [[Ivf.train]]): PCA needs only a
  * representative sample, so the covariance is ONE bounded collect
  * folded sequentially in id order — bit-reproducible across runs and
  * partitionings — and the eigendecomposition is cyclic Jacobi with a
  * FIXED sweep count in the sqrt form (rotations use only + * / √,
  * all IEEE-exact operations, NO transcendentals), so the Python
  * oracle replays the basis bit-for-bit. The corpus-wide projection
  * is a codegen'd expression with the model as a plan reference
  * object — a per-row matvec, map-side, no shuffle.
  */
object Pca {

  /** mean (dim) + row-major basis (k × dim), eigenvalue-descending. */
  final class PcaModel(val mean: Array[Double],
                       val basis: Array[Array[Double]],
                       val eigenvalues: Array[Double]) extends Serializable {
    def k: Int = basis.length
    def dim: Int = mean.length

    /** Projection of one vector read from ArrayData (executor path). */
    def projectData(arr: ArrayData, isFloat: Boolean): ArrayData = {
      val n = math.min(dim, arr.numElements())
      val out = new Array[Double](k)
      var r = 0
      while (r < k) {
        val b = basis(r)
        var s = 0.0
        var i = 0
        while (i < n) {
          val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          s += b(i) * (x - mean(i))
          i += 1
        }
        out(r) = s
        r += 1
      }
      ArrayData.toArrayData(out)
    }
  }

  /** Fixed Jacobi sweep count: 64-dim symmetric matrices converge to
    * machine precision well inside this; fixed (rather than
    * tolerance-stopped) so the op count is part of the deterministic
    * contract.
    */
  val JacobiSweeps = 30

  def train(df: DataFrame, vecCol: String, idCol: String, k: Int,
            maxTrainRows: Long = 200000L, seed: Long = 42L): PcaModel = {
    val sample = TrainSample.collect(df, vecCol, idCol, seed, maxTrainRows)
      .map(_._2)
    val dim = sample.head.length
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]")
    val n = sample.length
    // mean, sequential in id order
    val mean = new Array[Double](dim)
    sample.foreach { v =>
      var i = 0
      while (i < dim) { mean(i) += v(i).toDouble; i += 1 }
    }
    var i = 0
    while (i < dim) { mean(i) /= n; i += 1 }
    // covariance, sequential in id order then row-major index order
    val cov = Array.fill(dim)(new Array[Double](dim))
    sample.foreach { v =>
      val d = new Array[Double](dim)
      var a = 0
      while (a < dim) { d(a) = v(a).toDouble - mean(a); a += 1 }
      a = 0
      while (a < dim) {
        var b = a
        while (b < dim) { cov(a)(b) += d(a) * d(b); b += 1 }
        a += 1
      }
    }
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        cov(i)(j) /= n
        cov(j)(i) = cov(i)(j)
        j += 1
      }
      i += 1
    }
    basisFromCov(mean, cov, k)
  }

  /** The eigen tail shared by [[train]] and [[trainDistributed]]:
    * Jacobi on the covariance, eigenvalue-desc/index-asc order,
    * largest-|component|-positive sign — the deterministic
    * representative both Python oracles replay.
    */
  private def basisFromCov(mean: Array[Double], cov: Array[Array[Double]],
                           k: Int): PcaModel = {
    val dim = mean.length
    val (values, vectors) = jacobi(cov)
    val order = values.indices
      .sortBy(c => (-values(c), c))
      .take(k)
    val basis = order.map { c =>
      val v = Array.tabulate(dim)(r => vectors(r)(c))
      var best = 0
      var r = 1
      while (r < dim) {
        if (math.abs(v(r)) > math.abs(v(best))) best = r
        r += 1
      }
      if (v(best) < 0) v.map(-_) else v
    }.toArray
    new PcaModel(mean, basis, order.map(values).toArray)
  }

  /** Distributed PCA train over the FULL corpus — the scale path past
    * [[train]]'s bounded driver sample, for when tail directions a
    * 200k sample under-represents matter (rare-language clusters,
    * low-frequency topics). ONE distributed pass accumulates the
    * fixed-point first+second moments
    * ([[graft.functions.FixedMoments]] — long sums, so the fold is
    * order-independent and the model BIT-REPRODUCIBLE across
    * partitionings; see that aggregate's scaladoc for the envelope),
    * with map-side partial combine: one ≈16 KB buffer per partition
    * is all that ever shuffles or reaches the driver. The covariance
    * is then E[xxᵀ] − μμᵀ (raw-moment form — mathematically the same
    * covariance as [[train]]'s centered fold but NOT bit-equal to it;
    * each trainer is its own pinned algorithm with its own Python
    * oracle), and the eigendecomposition reuses [[train]]'s exact
    * driver-side Jacobi.
    */
  def trainDistributed(df: DataFrame, vecCol: String, idCol: String,
                       k: Int): PcaModel = {
    val dimRow = df.agg(max(size(col(vecCol)))).head()
    require(!dimRow.isNullAt(0), "cannot train on an empty corpus")
    val dim = dimRow.getInt(0)
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]")
    val F = graft.functions.FixedMoments.DefaultScale
    val buf = df.agg(graft.functions.FixedMoments.fixedMoments(
      col(vecCol), dim)).head().getSeq[Long](0)
    val (n, sums, gram) = graft.functions.FixedMoments.decode(buf, dim)
    require(n > 0, "cannot train on an empty corpus")
    val mean = sums.map(s => (s.toDouble / F) / n)
    val cov = Array.fill(dim)(new Array[Double](dim))
    var o = 0
    var a = 0
    while (a < dim) {
      var b = a
      while (b < dim) {
        val raw = (gram(o).toDouble / F) / n
        cov(a)(b) = raw - mean(a) * mean(b)
        cov(b)(a) = cov(a)(b)
        o += 1
        b += 1
      }
      a += 1
    }
    basisFromCov(mean, cov, k)
  }

  /** Cyclic Jacobi in the sqrt form: rotations from
    * t = sgn(τ)/(|τ| + √(1+τ²)), c = 1/√(1+t²), s = t·c — only
    * IEEE-exact operations, fixed (p, q) visit order, fixed sweep
    * count. Returns (eigenvalues, eigenvector COLUMNS).
    */
  private def jacobi(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((r, c) => if (r == c) 1.0 else 0.0)
    var sweep = 0
    while (sweep < JacobiSweeps) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val tau = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (tau >= 0.0) 1.0 / (tau + math.sqrt(1.0 + tau * tau))
              else -1.0 / (-tau + math.sqrt(1.0 + tau * tau))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = t * c
            var r = 0
            while (r < n) {
              val arp = a(r)(p)
              val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < n) {
              val apr = a(p)(r)
              val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              r += 1
            }
            r = 0
            while (r < n) {
              val vrp = v(r)(p)
              val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Column API: project a vector column onto the model's basis —
    * ARRAY<DOUBLE> of length k, codegen'd, map-side.
    */
  def project(vec: Column, model: PcaModel): Column =
    graft.functions.ColumnBridge.column(
      PcaProject(graft.functions.ColumnBridge.expression(vec), model))
}

/** Per-row PCA projection under a broadcast [[Pca.PcaModel]] (plan
  * reference object; kernel shared between eval and generated code).
  */
case class PcaProject(child: Expression, model: Pca.PcaModel)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT|DOUBLE>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pca_project"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any =
    model.projectData(a.asInstanceOf[ArrayData], elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("pcaModel", model, classOf[Pca.PcaModel].getName)
    val isF = elemIsFloat
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $m.projectData($a, $isF);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
