package graft.retrieve

import graft.core.Schemas.Scored
import graft.embed.EmbeddingModel
import graft.functions.VectorFunctions._
import graft.store.VectorStore
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Embed-then-retrieve wrappers (reference retrieval.py:59-130).
  *
  * `retrieveOnfly` embeds ad-hoc documents and queries without touching
  * the store and tags results `<temporary>` (retrieval.py:81);
  * `retrieveFromDb` embeds the query and delegates to the store's
  * flagship top-k. Embedding runs distributed via the model's batch
  * contract; similarity + top-k is scan → kernel →
  * `TakeOrderedAndProject`.
  */
final class Retrieval(val spark: SparkSession, val model: EmbeddingModel,
                      val store: VectorStore) {
  import spark.implicits._

  /** reference retrieval.py:59-83: on-the-fly embed + top-k. */
  def retrieveOnfly(query: String, documents: Seq[String],
                    topk: Int = 3): Seq[Scored] = {
    val qv = model.embed(query)
    val docs = spark.createDataset(documents.zipWithIndex)
      .toDF("text", "idx")
    val embedded = graft.embed.Embed.embedColumn(docs, model, "text", "vector")
    embedded
      .select(dotD($"vector", vecLit(qv)).as("sim"), $"text", $"idx")
      .orderBy($"sim".desc, $"idx".asc)
      .limit(topk)
      .select($"sim", lit("<temporary>").as("source"), $"text")
      .as[Scored].collect().toSeq
  }

  /** reference retrieval.py:85-102: embed and add to the store. */
  def add(source: String, text: String): Unit = batchAdd(Seq(source -> text))

  def batchAdd(items: Seq[(String, String)]): Unit = {
    val df = spark.createDataset(items).toDF("source", "text")
    val embedded = graft.embed.Embed.embedColumn(df, model, "text", "vector")
    store.add(embedded.select($"source", $"text", $"vector"))
  }

  /** reference retrieval.py:117-130: embed query, search the store. */
  def retrieveFromDb(query: String, topk: Int = 3): Seq[Scored] =
    store.retrieve(model.embed(query), topk)
      .map { case (sim, source, text) => Scored(sim, source, text) }
      .collect().toSeq
}
