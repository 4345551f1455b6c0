package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: concatenate documents (in id order) into
  * fixed token-budget sequences of length `seqLen`, documents allowed
  * to span a boundary — the standard LLM-pretraining packing step
  * (each doc maps to a [seq_first, seq_last] range of sequence ids via
  * its exclusive prefix token count).
  *
  * The 100 TB shape: a global `Window.orderBy` would collapse the
  * whole table into ONE partition, so the exclusive prefix sum is
  * computed the distributed way instead — range-repartition by id,
  * per-partition window cumsum (partitioned by `spark_partition_id`,
  * stays parallel), plus a driver-side prefix of the per-partition
  * totals (P values, broadcast back). The partitioned frame is
  * localCheckpoint'ed so the totals pass and the cumsum pass see the
  * SAME partition ids (range sampling re-evaluated could move rows
  * between jobs otherwise). Results are independent of where the
  * range boundaries land.
  */
object SeqPack {

  def packOffsets(spark: SparkSession, df: DataFrame, textCol: String,
                  idCol: String, seqLen: Long,
                  numParts: Int = 0): DataFrame =
    packOffsetsBy(spark, df, textCol, idCol, seqLen, Seq.empty, numParts)

  /** [[packOffsets]] under a caller-chosen TRAINING ORDER: documents
    * are packed in `(orderCols…, id)` order instead of id order — the
    * curriculum-learning shape (e.g. shortest-first: order by length,
    * so early training sequences hold easy/short documents). Same
    * distributed prefix-sum plan; the range partitioner and the
    * per-partition window just lead with the order columns.
    */
  def packOffsetsBy(spark: SparkSession, df: DataFrame, textCol: String,
                    idCol: String, seqLen: Long, orderCols: Seq[String],
                    numParts: Int = 0): DataFrame =
    packOffsetsCounted(spark, df, TextAnalysis.tokenCount(col(textCol)),
      idCol, seqLen, orderCols, numParts)

  /** [[packOffsetsBy]] under a caller-chosen TOKEN COUNTER: `countCol`
    * is any Column producing the per-document token count — pass the
    * codegen [[Bpe.bpeTokenCount]] to pack by REAL tokenizer lengths
    * instead of whitespace counts (what a production packing run
    * does: sequence budgets are model-tokenizer budgets). The counter
    * evaluates map-side in the first select; the prefix-sum plan is
    * unchanged.
    */
  def packOffsetsCounted(spark: SparkSession, df: DataFrame,
                         countCol: org.apache.spark.sql.Column,
                         idCol: String, seqLen: Long,
                         orderCols: Seq[String],
                         numParts: Int = 0): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val parts =
      if (numParts > 0) numParts else spark.sessionState.conf.numShufflePartitions
    val order = orderCols.map(col) :+ col("doc")
    val base = df
      .select((Seq(col(idCol).as("doc"),
        countCol.as("n_tokens")) ++
        orderCols.map(col)): _*)
      .repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    // P per-partition totals — a driver-bounded collect (one long per
    // partition), prefix-summed and broadcast back as a tiny dim table
    val totals = base.groupBy(col("pid")).agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts).scanLeft(0L) {
      (acc, p) => acc + totals.getOrElse(p, 0L)
    }
    import spark.implicits._
    val offDf = (0 until parts).map(p => (p, offsets(p))).toDF("pid", "off")
    val w = Window.partitionBy(col("pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offDf), Seq("pid"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) + col("off"))
      .select(col("doc"), col("n_tokens"), col("cum_before"),
        expr(s"cum_before div $seqLen").as("seq_first"),
        expr(s"(cum_before + n_tokens - 1) div $seqLen").as("seq_last"))
  }
}
