package graft.ingest

import graft.core.{PyText, Wrap}
import org.apache.spark.sql.{Dataset, SparkSession}

/** The reference's Debian-specific network sources (S7, S8/S9, S11,
  * S13 over the network, plus man/tldr command sources), re-expressed
  * over the pluggable [[HttpFetcher]] boundary with the same URL
  * construction, cleanup rules and wrap templates
  * (reader.py:552-583, 586-670, 739-763; policy.py:23-129).
  *
  * HTML → text uses a tag-strip approximation of BeautifulSoup
  * `get_text()`; element removal (BTS system messages) is a
  * non-nested regex over the class-tagged blocks, which matches the
  * page shapes the reference targets.
  */
final class DebianSources(spark: SparkSession, fetcher: HttpFetcher) {
  import spark.implicits._

  private def getText(html: String): String = HtmlText.text(html)

  /** S7 `read_bts` (reader.py:552-583). */
  def readBts(spec: String): Dataset[SourceEntry] = {
    val raw = fetcher.fetchWithRetry(s"https://bugs.debian.org/$spec")
    val cleanedHtml =
      if (spec.startsWith("src:")) raw
      else HtmlText.removeTagged(
        HtmlText.removeTagged(raw, "p", "msgreceived"), "div", "infmessage")
    var lines = PyText.splitLines(
      getText(cleanedHtml).trim
        .replaceAll("\n\n+\n", "\n\n")).map(_.trim)
    if (spec.startsWith("src:")) {
      val cut = lines.indexOf("Options")
      require(cut >= 0, "src: page without an Options section")
      lines = lines.take(cut)
    }
    spark.createDataset(Seq(SourceEntry(spec, lines.mkString("\n"),
      Wrap.Bts, Wrap.BtsChunk)))
  }

  /** S11 `read_archwiki` (reader.py:739-754): rstripped text lines. */
  def readArchwiki(spec: String): Dataset[SourceEntry] = {
    val raw = fetcher.fetchWithRetry(s"https://wiki.archlinux.org/title/$spec")
    val content = PyText.splitLines(getText(raw))
      .map(_.replaceAll("\\s+$", "")).mkString("\n")
    spark.createDataset(Seq(SourceEntry(spec, content,
      Wrap.Archwiki, Wrap.ArchwikiChunk)))
  }

  /** S11 `read_buildd` (reader.py:757-763). */
  def readBuildd(spec: String): Dataset[SourceEntry] = {
    val raw = fetcher.fetchWithRetry(
      s"https://buildd.debian.org/status/package.php?p=$spec")
    val content = PyText.splitLines(getText(raw))
      .map(_.replaceAll("\\s+$", "")).mkString("\n")
    spark.createDataset(Seq(SourceEntry(spec, content,
      Wrap.Buildd, Wrap.BuilddChunk)))
  }

  /** S8 `fetch_ldo_threads` (reader.py:586-660): spec expansion →
    * thread index pages → message links, following "next page"
    * recursively.
    */
  def fetchLdoThreads(spec: String, index: String = "threads.html"): Seq[String] =
    SpecExpansion.expand(spec).flatMap { one =>
      // Failure is LOCAL to this one expanded spec (reader.py:644-648
      // returns [] for the failed month and keeps the rest); a `return`
      // here would be a Scala non-local return aborting the whole
      // expansion and discarding already-collected URLs.
      scala.util.Try(
          fetcher.fetchWithRetry(s"https://lists.debian.org/$one/$index"))
        .toOption.fold(Seq.empty[String]) { html =>
          val links = HtmlText.hrefs(html).filter(_.startsWith("msg"))
          val urls = links.map(l => s"https://lists.debian.org/$one/$l")
          val next = HtmlText.linkWithText(html, "next page")
          urls ++ next.map(n => fetchLdoThreads(one, n)).getOrElse(Seq.empty)
        }
    }

  /** S9 `read_ldo_threads` (reader.py:663-670): the thread-pool fetch
    * fan-out becomes partition-parallel `mapPartitions` over the URL
    * set — the distributed shape of the same concurrency.
    */
  def readLdoThreads(spec: String): Dataset[SourceEntry] = {
    val f = fetcher
    spark.createDataset(fetchLdoThreads(spec))
      .repartition(math.max(1, spark.sparkContext.defaultParallelism))
      .mapPartitions(_.map { url =>
        val raw = f.fetchWithRetry(url)
        val content =
          if (raw.take(512).toLowerCase.contains("<html"))
            PyText.squeezeBlankLines(HtmlText.text(raw))
          else raw
        SourceEntry(url, content, Wrap.UrlBacktick, Wrap.UrlBacktickChunk)
      })
  }

  /** man/tldr command sources (reader.py:963-968, 1011-1017). */
  def readMan(spec: String, reg: SourceRegistry): Dataset[SourceEntry] =
    reg.readCmd(s"man $spec")
      .map(e => e.copy(path = spec, template = Wrap.Man,
        chunkTemplate = Wrap.ManChunk))

  /** S13 over the network: the policy / devref sectioned documents
    * (reader.py:969-1004 policy; 909-937 devref). `spec` semantics:
    * "all" → whole document; "" → every section as its own entry;
    * "x.y" → that section. Wording is preserved verbatim per document,
    * including the devref quirks: section entries are labeled
    * "... document [x]" (not "... section [x]"), and the scan ("")
    * templates are comma-less with the empty spec baked in.
    */
  def readPolicy(spec: String,
                 url: String = "https://www.debian.org/doc/debian-policy/policy.txt",
                 devref: Boolean = false)
      : Dataset[SourceEntry] = {
    val doc = new SectionedDoc(spark, fetcher.fetchWithRetry(url))
    val (fullLabel, sectionLabel, full, fullC, sect, sectC, scan, scanC) =
      if (devref)
        ("Debian Developer Reference document",
         (i: String) => s"Debian Developer Reference document [$i]",
         Wrap.DevrefFull, Wrap.DevrefFullChunk,
         Wrap.DevrefSection, Wrap.DevrefSectionChunk,
         Wrap.DevrefScan, Wrap.DevrefScanChunk)
      else
        ("Debian Policy document",
         (i: String) => s"Debian Policy section [$i]",
         Wrap.PolicyFull, Wrap.PolicyFullChunk,
         Wrap.PolicySection, Wrap.PolicySectionChunk,
         Wrap.PolicyScan, Wrap.PolicyScanChunk)
    val entries = spec match {
      case "all" => Seq(SourceEntry(fullLabel, doc.fullText, full, fullC,
        wrapSpec = Some("full contents")))
      case "" => doc.scanIndexes().map(idx =>
        SourceEntry(sectionLabel(idx), doc.section(idx), scan, scanC,
          wrapSpec = Some("")))
      case idx => Seq(SourceEntry(sectionLabel(idx), doc.section(idx),
        sect, sectC, wrapSpec = Some(idx)))
    }
    spark.createDataset(entries)
  }

  /** S14 `read_sbuild` (reader.py:256-307): newest `*.build` by mtime
    * (A6 max-by), sliced between the Build/Changes box markers.
    */
  def readSbuild(glob: String): Dataset[SourceEntry] = {
    val files = new java.io.File(".").toPath.getFileSystem
      .getPathMatcher("glob:" + glob)
    val dir = java.nio.file.Paths.get(glob).getParent
    val candidates = java.nio.file.Files.list(
        if (dir == null) java.nio.file.Paths.get(".") else dir)
      .filter(p => files.matches(p)).iterator()
    val latest = scala.jdk.CollectionConverters.IteratorHasAsScala(candidates)
      .asScala.toSeq
      .maxByOption(p => java.nio.file.Files.getLastModifiedTime(p).toMillis)
      .getOrElse(throw new java.io.FileNotFoundException(s"no files match $glob"))
    val text = java.nio.file.Files.readString(latest)
    val sliced = BuildLog.extractBuildChanges(text).getOrElse("")
    spark.createDataset(Seq(SourceEntry(latest.toString, sliced,
      Wrap.Sbuild, Wrap.SbuildChunk)))
  }
}

