package graft.session

import graft.core.Schemas
import graft.core.Schemas.ChatMessage
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-session chat log + JSON sink/replay
  * (reference frontend.py:47-58 `_check`, 180-184 `dump`;
  * replay.py:28-79).
  *
  * The session is an ordered append-only list of {role, content};
  * roles are {system, user, assistant} and an unknown role is an
  * error, both at append (frontend invariant) and at replay
  * (replay.py:28-57).
  */
final class ChatSession(val spark: SparkSession) {
  import spark.implicits._

  private var messages: Vector[ChatMessage] = Vector.empty

  private val ValidRoles =
    Set(Schemas.RoleSystem, Schemas.RoleUser, Schemas.RoleAssistant)

  def append(role: String, content: String): Unit = {
    require(ValidRoles.contains(role), s"unknown role $role")
    messages :+= ChatMessage(role, content, messages.length)
  }

  def history: Seq[ChatMessage] = messages

  def df: DataFrame = spark.createDataset(messages).toDF()

  /** S16: pretty-JSON session dump (frontend.py:180-184) — one JSON
    * array of {role, content} in order.
    */
  def dump(path: String): Unit = {
    val json = messages.map(m =>
      s"""{"role": ${quote(m.role)}, "content": ${quote(m.content)}}""")
      .mkString("[\n  ", ",\n  ", "\n]")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}

object ChatSession {
  /** Load a dumped session as a DataFrame (replay source,
    * replay.py:67-79); unknown roles error like replay.py:28-57.
    */
  def load(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val df = spark.read.option("multiLine", "true").json(path)
      .select(col("role"), col("content"))
    val bad = df.filter(!col("role").isin("system", "user", "assistant"))
      .limit(1).collect()
    require(bad.isEmpty, s"unknown role ${bad.headOption.map(_.getString(0))}")
    df
  }

  /** One replayed entry's render decision — the data content of
    * replay.py:28-65 `process_entry` with the rich visuals reduced to
    * directives: user → cyan 'User Input' panel (markup-escaped),
    * system → red 'System Message' panel (escaped), assistant →
    * Markdown when `render` else escaped plain text.
    */
  final case class RenderDirective(role: String, panelTitle: Option[String],
                                   borderStyle: Option[String],
                                   markdown: Boolean, text: String)

  private val EscapePattern =
    java.util.regex.Pattern.compile("""(\\*)(\[[a-z#/@][^\[]*?])""")

  /** `rich.markup.escape`, exactly: backslash-escape `[tag]`-shaped
    * openings (doubling any preceding backslashes) and protect a
    * single trailing backslash.
    */
  def richEscape(markup: String): String = {
    val m = EscapePattern.matcher(markup)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(markup, last, m.start())
      val bs = m.group(1)
      sb.append(bs).append(bs).append('\\').append(m.group(2))
      last = m.end()
    }
    sb.append(markup, last, markup.length)
    val out = sb.toString
    if (out.endsWith("\\") && !out.endsWith("\\\\")) out + "\\" else out
  }

  /** replay.py:28-65 per-entry contract over a loaded session. */
  def renderPlan(session: DataFrame, render: Boolean = true): Seq[RenderDirective] =
    session.collect().toSeq.map { r =>
      val role = r.getAs[String]("role")
      val content = r.getAs[String]("content")
      role match {
        case Schemas.RoleUser =>
          RenderDirective(role, Some("User Input"), Some("cyan"),
            markdown = false, richEscape(content))
        case Schemas.RoleSystem =>
          RenderDirective(role, Some("System Message"), Some("red"),
            markdown = false, richEscape(content))
        case Schemas.RoleAssistant =>
          if (render) RenderDirective(role, None, None, markdown = true, content)
          else RenderDirective(role, None, None, markdown = false, richEscape(content))
        case other =>
          throw new IllegalArgumentException(s"unknown role in $other")
      }
    }
}
