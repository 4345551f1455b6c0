package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Bounded-heap top-k aggregate: `top_k_by(score, id, k)` keeps the k
  * highest-score (score, id) pairs per group, ties broken by lower id.
  *
  * This is the many-queries-at-once retrieval operator SURVEY.md §4
  * calls out: a `Window.partitionBy(qid).orderBy(sim desc)` +
  * `row_number <= k` plan SORTS every group in full, which at
  * 100 TB means a shuffle carrying every (qid, nid, sim) candidate and
  * an O(n log n) sort per query. The heap aggregate keeps O(k) state
  * per query, combines partial heaps map-side (pre-shuffle), and
  * shuffles only k rows per query — the same partial/final shape as
  * `TakeOrderedAndProject` but per group.
  *
  * Returns ARRAY<STRUCT<score DOUBLE, id BIGINT>> in descending score
  * order; explode + inline for row form.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // min-heap on (score asc, id desc) so the worst kept element is on
  // top: evict when a better (higher score, or equal score lower id)
  // candidate arrives
  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(ord)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
                    cand: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(cand)
    else {
      val worst = buf.head
      // keep cand if (score, -id) beats the current worst
      if (cand._1 > worst._1 || (cand._1 == worst._1 && cand._2 < worst._2)) {
        buf.dequeue()
        buf.enqueue(cand)
      }
    }
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toSeq.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def prettyName: String = "top_k_by"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKByScore {
  import org.apache.spark.sql.functions._

  /** Column API: `topKBy(score, id, k)` as an aggregate column. */
  def topKBy(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())

  /** Column API: `topKByTag(score, id, tag, k)` — the payload-carrying
    * variant (see [[TopKByScoreTag]]).
    */
  def topKByTag(score: Column, id: Column, tag: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScoreTag(ColumnBridge.expression(score), ColumnBridge.expression(id),
        ColumnBridge.expression(tag), k)
        .toAggregateExpression())
}

/** [[TopKByScore]] with a LONG payload column carried through the heap
  * unmodified: `top_k_by_tag(score, id, tag, k)` keeps the k
  * highest-score rows (ties to lower id — the tag never participates
  * in ordering) and returns ARRAY<STRUCT<score, id, tag>>. The point
  * is plan shape: a consumer that needs a non-ranking column of the
  * winners (e.g. the sampling weight that PRODUCED the score) would
  * otherwise re-join the k winners back to the input — one extra
  * shuffle and a full recompute of the un-pinned upstream. Carrying
  * it as heap payload costs 8 bytes × k state and nothing else.
  */
case class TopKByScoreTag(
    scoreExpr: Expression,
    idExpr: Expression,
    tagExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long, Long)]] {

  require(k > 0, "k must be positive")

  // min-heap on (score asc, id desc): worst kept element on top
  private def ord: Ordering[(Double, Long, Long)] =
    Ordering.by[(Double, Long, Long), (Double, Long)] { case (s, i, _) => (-s, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long, Long)] =
    mutable.PriorityQueue.empty(ord)

  override def update(buf: mutable.PriorityQueue[(Double, Long, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    val t = tagExpr.eval(input)
    if (s != null && i != null && t != null)
      offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long], t.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long, Long)],
                     other: mutable.PriorityQueue[(Double, Long, Long)]): mutable.PriorityQueue[(Double, Long, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  private def offer(buf: mutable.PriorityQueue[(Double, Long, Long)],
                    cand: (Double, Long, Long)): Unit = {
    if (buf.size < k) buf.enqueue(cand)
    else {
      val worst = buf.head
      if (cand._1 > worst._1 || (cand._1 == worst._1 && cand._2 < worst._2)) {
        buf.dequeue()
        buf.enqueue(cand)
      }
    }
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long, Long)]): Any = {
    val sorted = buf.toSeq.sortBy { case (s, i, _) => (-s, i) }
    new GenericArrayData(sorted.map { case (s, i, t) =>
      InternalRow(s, i, t)
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i, t) =>
      out.writeDouble(s); out.writeLong(i); out.writeLong(t)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.enqueue((in.readDouble(), in.readLong(), in.readLong())); i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("tag", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, tagExpr)
  override def prettyName: String = "top_k_by_tag"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreTag =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreTag =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1),
      tagExpr = newChildren(2))
}
