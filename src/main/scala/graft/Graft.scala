package graft

import graft.core.{Chunker, Schemas}
import graft.embed.{EmbeddingModel, HashEmbedding}
import graft.ingest.{HttpFetcher, NoNetworkFetcher, SourceRegistry}
import graft.mapreduce.{MapReduceEngine, MrChunk, TextFunctor}
import graft.retrieve.Retrieval
import graft.session.ChatSession
import graft.store.VectorStore
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The user-facing facade mirroring the reference's command surface
  * (SURVEY.md §7.1 item 11) — a user of the reference switches here:
  *
  *  - `vdbLs` / `vdbDump`   ↔ `debgpt vdb ls|dump` (cli.py:102-133)
  *  - `retrieveAdd` / `retrieveRet` ↔ `debgpt retrieval add|ret`
  *    (retrieval.py:133-175)
  *  - `mapreduce`           ↔ `debgpt -x <spec> -A <question>`
  *    (cli.py:237-248 → mapreduce.py:434-550)
  *  - `gatherInformation`   ↔ `debgpt -f <spec> -A <question>` prompt
  *    assembly (cli.py:222-270: specs consumed in CLI order, the ask
  *    appended last)
  *  - `replay`              ↔ `debgpt replay` (replay.py:67-79)
  */
final class Graft(
    val spark: SparkSession,
    val storePath: String,
    val embeddingDim: Int = 256, // reference defaults.py:64
    val embedder: Option[EmbeddingModel] = None,
    val fetcher: HttpFetcher = NoNetworkFetcher) {

  val model: EmbeddingModel = embedder.getOrElse(HashEmbedding(embeddingDim))
  val store = new VectorStore(spark, storePath, embeddingDim)
  val retrieval = new Retrieval(spark, model, store)
  val sources = new SourceRegistry(spark, fetcher)

  // ----------------------------------------------------------- vdb ----
  def vdbLs(): DataFrame = store.ls()

  def vdbDump(outPath: String, includeVector: Boolean = false,
              ids: Seq[Long] = Nil): Unit =
    store.dump(outPath, includeVector, ids)

  // ------------------------------------------------------ retrieval ----
  def retrieveAdd(source: String, text: String): Unit =
    retrieval.add(source, text)

  def retrieveRet(query: String, k: Int = 3): Seq[Schemas.Scored] =
    retrieval.retrieveFromDb(query, k)

  // ------------------------------------------------------ mapreduce ----
  /** `debgpt -x`: read + chunk the spec, fold with the functor. */
  def mapreduce(spec: String, functor: TextFunctor,
                question: Option[String] = None,
                chunkSize: Long = 65536L, // reference defaults.py:67
                compactMap: Boolean = true,
                compactReduce: Boolean = true): String = {
    import spark.implicits._
    val engine = new MapReduceEngine(functor, chunkSize, compactMap, compactReduce)
    val entries = sources.read(spec).collect().toSeq
      .sortBy(_.path)
      .map(e => (e.spec, e.chunkTemplate, e.content))
    val chunks = engine.chunkEntries(entries)
    engine.run(spark, spark.createDataset(chunks),
      question.getOrElse(graft.mapreduce.MrTemplates.DefaultQuestion))
  }

  // ------------------------------------------------- prompt assembly ----
  /** `gather_information_ordered` (cli.py:222-270): specs are
    * consumed in CLI order, each contributing its wrapped content on a
    * fresh line; the user's ask goes last.
    */
  def gatherInformation(specs: Seq[String], ask: Option[String]): Option[String] = {
    var msg: Option[String] = None
    specs.foreach { spec =>
      val wrapped = sources.read(spec).collect().toSeq
        .sortBy(_.path).map(_.wrapped).mkString("\n")
      msg = Some(msg.fold("")(_ + "\n") + wrapped)
    }
    ask.foreach { a =>
      val base = msg.getOrElse("")
      msg = Some(base + (if (base.isEmpty) "" else "\n") + a)
    }
    msg
  }

  // --------------------------------------------------------- replay ----
  def replay(sessionJsonPath: String): DataFrame =
    ChatSession.load(spark, sessionJsonPath)
}
