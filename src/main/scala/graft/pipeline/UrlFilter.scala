package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** URL/domain blocklist filtering — the RefinedWeb/C4-style source
  * hygiene pass (Penedo et al. 2023 §3.1: curated blocklists of adult
  * / fraud / ad domains are the first thing a web corpus goes
  * through). A host matches the blocklist if it EQUALS an entry or is
  * a SUBDOMAIN of one (`ads.tracker.example` matches entry
  * `tracker.example`) — standard suffix-blocklist semantics.
  *
  * 100 TB shape: the blocklist (≤ a few million entries) broadcasts
  * as a hash set inside a codegen'd expression; each row walks its
  * host's ≤ ~8 label suffixes with O(1) set probes — a pure map pass,
  * ZERO shuffle, no explode blow-up, no per-entry regex scan. (The
  * equi-join alternative — explode suffixes, broadcast-join the
  * blocklist — shuffles doc ids back for the flag; the set-probe
  * expression does strictly less work for the same result.)
  */
object UrlFilter {

  /** Host of a URL via Spark's native try_parse_url (null for
    * unparseable input — flagged not-blocked downstream, a filter
    * should never crash the corpus; plain parse_url THROWS on junk
    * under ANSI, which a 100 TB web scrape will certainly contain).
    */
  def hostOf(url: Column): Column = try_parse_url(url, lit("HOST"))

  /** TRUE iff the host equals a blocklist entry or is a subdomain of
    * one. Codegen'd suffix walk; NULL host → FALSE (total).
    */
  def hostBlocked(host: Column, blocklist: Seq[String]): Column =
    graft.functions.ColumnBridge.column(
      HostBlocked(graft.functions.ColumnBridge.expression(
        coalesce(host, lit(""))), blocklist.toArray))

  /** Flag pass: (…, host, blocked) added to every row. */
  def flagBlockedUrls(df: DataFrame, urlCol: String,
                      blocklist: Seq[String]): DataFrame =
    df.withColumn("host", hostOf(col(urlCol)))
      .withColumn("blocked", hostBlocked(col("host"), blocklist))

  /** Filter pass: rows whose URL host survives the blocklist. */
  def dropBlockedUrls(df: DataFrame, urlCol: String,
                      blocklist: Seq[String]): DataFrame =
    df.where(!hostBlocked(hostOf(col(urlCol)), blocklist))

  /** Canonical URL dedup key — the Dolma/CCNet-style pre-dedup pass
    * (the same page is crawled as http/https, with/without `www.`,
    * with tracking queries, with a trailing slash): scheme dropped,
    * host lowercased and a leading `www.` stripped, query/fragment
    * dropped, trailing slashes trimmed (empty path → "/"). Built
    * from regexp built-ins only — map-side, codegen'd, and replayable
    * verbatim by the SQL oracle.
    */
  def canonicalUrl(url: Column): Column = {
    val host = regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
      "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      "/+$", "")
    concat(host, when(path === "", lit("/")).otherwise(path))
  }

  /** Keep the lowest id per canonical URL — same hash-window scale
    * shape as [[Dedup.dropExactDups]] (one shuffle on the canonical
    * key, no pairs).
    */
  def dropDupUrls(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(canonicalUrl(col(urlCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }
}

/** Codegen'd suffix-blocklist probe: String host in, Boolean out.
  * The entry set ships once per task as a plan reference object (the
  * engine's broadcast-model pattern).
  */
case class HostBlocked(child: Expression, entries: Array[String])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "host_blocked"

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](entries.length * 2)
    entries.foreach(e => s.add(e))
    s
  }

  override def nullSafeEval(h: Any): Any =
    HostBlocked.probe(h.toString, set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("blockSet", set,
      classOf[java.util.HashSet[String]].getName)
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.pipeline.HostBlocked.probe($h.toString(), $ref);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HostBlocked {
  /** Walk the host's dot-suffixes (host itself first): O(labels) set
    * probes, no allocation beyond the substring views.
    */
  def probe(host: String, set: java.util.HashSet[String]): Boolean = {
    var i = 0
    while (i <= host.length) {
      if (i == 0 || (i > 0 && i < host.length && host.charAt(i - 1) == '.')) {
        if (set.contains(if (i == 0) host else host.substring(i))) return true
      }
      i += 1
    }
    false
  }
}
