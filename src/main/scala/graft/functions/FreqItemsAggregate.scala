package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra–Gries heavy-hitters summary as a mergeable aggregate:
  * `misra_gries(term, m)` keeps at most `m` (term, weight) counters
  * per group with the classic guarantee — every item whose true
  * frequency exceeds N/(m+1) is IN the summary, and each kept weight
  * under-counts its true frequency by at most N/(m+1).
  *
  * The 100 TB point: a full `groupBy(term).count` over corpus n-grams
  * shuffles the ENTIRE term universe (billions of keys) to find 30
  * frequent ones. This summary is O(m) state per partial, combines
  * map-side like any aggregate, and ships ≤ m counters per partition
  * — the shuffle is m rows, not the vocabulary. Downstream, an exact
  * second pass over just the ≤ m candidates (broadcast set filter +
  * tiny agg) restores EXACT counts — see
  * [[graft.pipeline.HeavyHitters]] — so the sketch never appears in
  * oracled output.
  *
  * Merge is the Agarwal et al. (PODS 2012) mergeable-summaries rule:
  * sum counters, then subtract the (m+1)-th largest weight from all
  * and drop non-positives — the union keeps the same error bound.
  * Deterministic: eviction subtracts the minimum surviving weight
  * (no tie choices), and eval orders by (weight desc, term asc).
  */
case class MisraGries(
    termExpr: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(m > 0, "capacity m must be positive")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val t = termExpr.eval(input)
    if (t != null) {
      val s = t.toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None =>
          buf.update(s, 1L)
          if (buf.size > m) shrink(buf)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (s, c) =>
      buf.update(s, buf.getOrElse(s, 0L) + c)
    }
    if (buf.size > m) shrink(buf)
    buf
  }

  /** Subtract the (m+1)-th largest weight from every counter and drop
    * non-positives — leaves ≤ m counters (the classic decrement, and
    * exactly the mergeable-summaries union rule).
    */
  private def shrink(buf: mutable.HashMap[String, Long]): Unit = {
    val weights = buf.values.toArray
    java.util.Arrays.sort(weights)
    // (m+1)-th largest = index (size - m - 1) ascending
    val d = weights(buf.size - m - 1)
    val dead = buf.iterator.filter(_._2 <= d).map(_._1).toArray
    dead.foreach(buf.remove)
    buf.mapValuesInPlace((_, c) => c - d)
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toSeq.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) => out.writeUTF(s); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { val s = in.readUTF(); buf.update(s, in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("weight", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(termExpr)
  override def prettyName: String = "misra_gries"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(termExpr = newChildren(0))
}

object MisraGries {
  /** Column API: `misraGries(term, m)` aggregate column. */
  def misraGries(term: Column, m: Int): Column =
    ColumnBridge.column(
      MisraGries(ColumnBridge.expression(term), m).toAggregateExpression())
}
