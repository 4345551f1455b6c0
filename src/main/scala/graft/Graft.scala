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

  // ---------------------------------------------------------- cache ----
  /** The session's read-through fetch cache (reference defaults.CACHE
    * SQLite, cache.py:45-183) — [[graft.cache.TtlCache.memoize]] is
    * the `enable_cache` contract.
    */
  val cache = new graft.cache.TtlCache(spark)

  /** `debgpt delete_cache` (cli.py:85-91): drop the cache — the
    * reference `os.remove`s the SQLite file at defaults.CACHE; here
    * the in-session table is cleared and the persisted parquet copy,
    * if given, removed.
    */
  def deleteCache(persistedPath: Option[String] = None): Unit = {
    cache.clear()
    persistedPath.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) fs.delete(hp, true)
    }
  }

  // ----------------------------------------------------- git commit ----
  /** `debgpt git commit` message synthesis (cli.py:141-176
    * `subcmd_git_commit`): assemble recent commit titles + the staged
    * diff into the reference's verbatim prompt, fold it through the
    * functor (the reference's one LLM turn), return the message.
    * Running `git commit -m <result>` stays caller-side — the engine
    * produces the message, it never mutates the caller's repository
    * (the reference only commits under its `--inplace` flags, which
    * are frontend, not engine, surface).
    *
    * `cwd` scopes both git invocations to a target repository; the
    * command outputs keep their trailing newline per readCmd's S6
    * contract, so the staged diff's closing fence sits on its own
    * line exactly as the reference assembles it.
    */
  def gitCommit(functor: TextFunctor, cwd: Option[String] = None): String = {
    def cmdOut(cmd: String): String = {
      val prefixed = cwd.fold(cmd)(d => s"cd ${shq(d)} && $cmd")
      sources.readCmd(prefixed).collect().head.content
    }
    val titles = cmdOut("git log --pretty=format:%s --max-count=10")
    val diff = cmdOut("git diff --staged")
    // reference prompt, byte-for-byte (cli.py:143-153): note the
    // missing newline after the opening titles fence — observable
    // output parity, same rule as the F9 templates
    val msg = "Previous commit titles:\n" +
      "```" + titles + "```" + "\n" +
      "Change diff:\n" +
      "```\n" + diff + "```\n" +
      "\n" +
      "Write a good git commit message subject line for the change " +
      "diff shown above, using the project style visible in previous " +
      "commits titles above."
    functor(msg)
  }

  private def shq(s: String): String = "'" + s.replace("'", "'\\''") + "'"
}
