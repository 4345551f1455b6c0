package graft.core

import java.sql.Timestamp

/** Case-class data model of the engine (SURVEY.md §1.1).
  *
  * Mirrors the reference's row shapes — `Entry` namedtuple
  * (reference reader.py:54), chunk map keys (reader.py:178-192), the
  * `vectors` SQLite table (vectordb.py:61-68), the `cache` table
  * (cache.py:57-64), chat messages (frontend.py:47-58) and the
  * vector-service `messages` model (vector_service/app.py:38-48) — as
  * Spark-encodable case classes. The reference's formatting closures
  * (`wrapfun`/`wrapfun_chunk`) are deliberately NOT part of the data
  * model; they become pure template functions (graft.core.Wrap).
  */
object Schemas {

  /** Guard for the naive-timestamp readers: casting TIMESTAMP_NTZ →
    * TIMESTAMP re-tags the wall-clock value in the SESSION time zone,
    * which is only instant-preserving because every entry point pins
    * UTC. Assert it where the cast happens, so a future non-UTC
    * caller fails loudly instead of silently shifting event times.
    */
  def requireUtcSession(spark: org.apache.spark.sql.SparkSession): Unit = {
    val tz = spark.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC" || tz == "Etc/UTC" || tz == "GMT",
      s"naive-timestamp (TIMESTAMP_NTZ) columns are re-tagged in the " +
        s"session time zone; the engine's readers assume UTC, got '$tz'")
  }

  /** One readable document: source path/spec + full text content. */
  final case class Entry(path: String, content: String)

  /** One chunk of a document. `start`/`end` are 0-based line indexes,
    * end exclusive (reference reader.py:1061-1071). `ord` is the
    * global sequence number — order is part of the mapreduce contract.
    */
  final case class Chunk(path: String, start: Int, end: Int,
                         content: String, ord: Long)

  /** Vector-store row (reference vectordb.py:61-68). The vector is
    * L2-normalized at insert and truncated to `dim` components; ids
    * are dense and ascending (autoincrement contract).
    */
  final case class VectorRow(id: Long, source: String, text: String,
                             vector: Array[Float])

  /** TTL key-value cache row (reference cache.py:57-64). */
  final case class CacheEntry(key: String, value: String, stamp: Timestamp)

  /** In-session chat message (reference frontend.py:47-58). */
  final case class ChatMessage(role: String, content: String, ord: Int)

  /** Conversation-memory row: the single table replacing the
    * reference's SQLite+Qdrant dual store
    * (vector_service/app.py:38-48,127-139). `timestamp` is epoch
    * seconds; `vector` is the message embedding.
    */
  final case class Message(id: String, conversationId: String, role: String,
                           text: String, timestamp: Long,
                           vector: Array[Float])

  /** Retrieval result triple (reference vectordb.py:209-213). */
  final case class Scored(sim: Double, source: String, text: String)

  /** Opaque multimodal payload: media bytes + typed metadata
    * (north-star multimodal column support; decode is stubbed).
    */
  final case class MediaRow(id: Long, kind: String, bytes: Array[Byte],
                            width: Int, height: Int, durationMs: Long)

  val RoleSystem = "system"
  val RoleUser = "user"
  val RoleAssistant = "assistant"
  /** Roles the memory service accepts (app.py:195-197). */
  val ServiceRoles: Set[String] = Set(RoleUser, RoleAssistant)
}
