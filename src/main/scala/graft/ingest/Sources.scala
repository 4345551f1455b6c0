package graft.ingest

import graft.core.{PyText, Wrap}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.{CodingErrorAction, StandardCharsets}

/** One readable source entry: spec + content + its wrap templates
  * (the reference's `Entry` with closures-as-data — SURVEY.md §1.1).
  */
final case class SourceEntry(path: String, content: String,
                             template: String, chunkTemplate: String,
                             wrapSpec: Option[String] = None) {
  /** The value baked into the wrap template. Usually the path, but the
    * reference sometimes bakes a different spec than the entry label —
    * e.g. policy "all" wraps with 'full contents' while the entry is
    * labeled 'Debian Policy document' (reader.py:973-981).
    */
  def spec: String = wrapSpec.getOrElse(path)

  def wrapped: String = Wrap.wrapContent(template, spec, content)
}

/** Pluggable HTTP boundary (S5). The build environment has zero
  * egress, so the default fetcher refuses; tests inject fixtures.
  * `fetchWithRetry` reproduces the reference's 3×5s tenacity policy
  * (reader.py:390-391,486-487).
  */
trait HttpFetcher extends Serializable {
  def fetch(url: String): String

  def fetchWithRetry(url: String, attempts: Int = 3,
                     waitMs: Long = 5000L): String = {
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return fetch(url)
      catch {
        case t: Throwable =>
          last = t
          i += 1
          if (i < attempts) Thread.sleep(waitMs)
      }
    }
    throw last
  }
}

object NoNetworkFetcher extends HttpFetcher {
  override def fetch(url: String): String =
    throw new UnsupportedOperationException(
      s"network disabled in this environment; cannot fetch $url")
}

final case class FixtureFetcher(pages: Map[String, String],
                                retryWaitMs: Long = 0L) extends HttpFetcher {
  override def fetch(url: String): String =
    pages.getOrElse(url, throw new java.io.FileNotFoundException(url))

  override def fetchWithRetry(url: String, attempts: Int,
                              waitMs: Long): String =
    super.fetchWithRetry(url, attempts, retryWaitMs)
}

/** Memoized fetch — the reference's `enable_cache` decorator around
  * url/bts/archwiki/buildd readers (reader.py:157-175): a hit serves
  * from the TTL cache table, a miss fetches once and is stored. The
  * driver-side point lookup keeps the semantics; the set-oriented
  * variant for URL fan-outs is [[graft.cache.TtlCache.memoize]].
  */
final class CachingFetcher(inner: HttpFetcher,
                           cache: graft.cache.TtlCache) extends HttpFetcher {
  override def fetch(url: String): String =
    cache.get(url).getOrElse {
      val v = inner.fetch(url)
      cache.put(url, v)
      v
    }
}

/** Multi-source document reader — the engine's S1–S15 surface
  * (reference reader.py `read` dispatcher, reader.py:766-1032).
  * Local sources are real; network sources run through the injected
  * [[HttpFetcher]] (same dispatch + wrap-template contract).
  */
final class SourceRegistry(spark: SparkSession,
                           fetcher: HttpFetcher = NoNetworkFetcher,
                           pdf: PdfExtractor = PdfExtractor.PureJvm,
                           env: String => Option[String] = k => sys.env.get(k)) {
  import spark.implicits._

  private lazy val debian = new DebianSources(spark, fetcher)

  /** S15: unified spec dispatch (same prefixes and precedence as the
    * reference dispatcher, reader.py:812-1032). `userQuestion` backs
    * the bare `google:` spec, which searches for the user's question
    * when no explicit query is given (reader.py:944).
    */
  def read(spec: String, userQuestion: String = ""): Dataset[SourceEntry] = {
    val f = new java.io.File(spec)
    if (f.exists && f.isFile) readFile(spec)
    else if (f.exists && f.isDirectory) readDirectory(spec)
    // file:// serves LOCAL files (the reference reads it via pycurl,
    // reader.py:379-483) — it must not hit the HTTP fetcher.
    else if (spec.startsWith("file://")) readFileUrl(spec)
    else if (Seq("http://", "https://").exists(spec.startsWith))
      readUrl(spec)
    else if (spec.startsWith("archwiki:")) debian.readArchwiki(spec.stripPrefix("archwiki:"))
    else if (spec.startsWith("bts:")) debian.readBts(spec.stripPrefix("bts:"))
    else if (spec.startsWith("buildd:")) debian.readBuildd(spec.stripPrefix("buildd:"))
    else if (spec.startsWith("cmd:")) readCmd(spec.stripPrefix("cmd:"))
    else if (spec.startsWith("google:")) {
      val explicit = spec.stripPrefix("google:")
      val query = if (explicit.nonEmpty) explicit else userQuestion
      require(query.nonEmpty, "Please provide a search query.")
      readGoogle(query)
    }
    else if (spec.startsWith("ldo:")) debian.readLdoThreads(spec.stripPrefix("ldo:"))
    else if (spec.startsWith("lists.debian.org:"))
      debian.readLdoThreads(spec.stripPrefix("lists.debian.org:"))
    else if (spec.startsWith("man:")) debian.readMan(spec.stripPrefix("man:"), this)
    else if (spec.startsWith("nm:")) readNm(spec.stripPrefix("nm:"))
    else if (spec.startsWith("policy:")) debian.readPolicy(spec.stripPrefix("policy:"))
    else if (spec.startsWith("devref:")) debian.readPolicy(spec.stripPrefix("devref:"),
      url = "https://www.debian.org/doc/manuals/developers-reference/developers-reference.en.txt",
      devref = true)
    else if (spec.startsWith("sbuild:")) debian.readSbuild(spec.stripPrefix("sbuild:"))
    else if (spec.startsWith("tldr:")) readCmd(s"tldr ${spec.stripPrefix("tldr:")}")
      .map(e => e.copy(path = spec.stripPrefix("tldr:"),
        template = Wrap.Tldr, chunkTemplate = Wrap.TldrChunk))
    else if (spec == "stdin" || spec == "-") readStdin()
    else throw new java.io.FileNotFoundException(
      s"File or resource ${PyText.pyRepr(spec)} not recognized")
  }

  /** S1/S2/S3: whole file as one entry. UTF-8 text is read directly;
    * `.pdf` goes through the pluggable [[PdfExtractor]] (the
    * reference's pypdf path, reader.py:310-333,415-418); other
    * undecodable content degrades to an empty entry
    * (reader.py:225-239,336-350).
    */
  def readFile(path: String): Dataset[SourceEntry] = {
    val p = pdf
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .map { r =>
        val path0 = SourceRegistry.stripScheme(r.getString(0))
        SourceEntry(path0,
          SourceRegistry.fileContent(path0, r.getAs[Array[Byte]](1), p),
          Wrap.File, Wrap.FileChunk)
      }
  }

  /** S4: recursive directory walk; `.git`/`__pycache__` subtrees
    * pruned; unsupported (non-UTF-8) files become empty entries
    * (reader.py:353-376). Distributed: the binaryFile source lists and
    * reads files across executors; the skiplist is a path filter.
    */
  def readDirectory(path: String): Dataset[SourceEntry] = {
    val skip = Seq(".git", "__pycache__")
    val p = pdf
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(path)
      .select(col("path"), col("content"))
      .filter(r => !skip.exists(s =>
        SourceRegistry.stripScheme(r.getString(0)).split('/').contains(s)))
      .map { r =>
        val path0 = SourceRegistry.stripScheme(r.getString(0))
        // bulk-walk semantics: one unextractable PDF (encrypted,
        // corrupt) degrades to an empty entry like any other stray
        // binary — a distributed walk must not die on a single file.
        // readFile keeps the raising contract (reference parity for
        // an explicitly named file).
        val content =
          try SourceRegistry.fileContent(path0, r.getAs[Array[Byte]](1), p)
          catch { case _: UnsupportedOperationException => "" }
        SourceEntry(path0, content, Wrap.File, Wrap.FileChunk)
      }
  }

  /** S5: URL fetch through the boundary; HTML stripped + blank-line
    * squeeze (reader.py:455-467).
    */
  def readUrl(url: String): Dataset[SourceEntry] = {
    val raw = fetcher.fetchWithRetry(url)
    spark.createDataset(Seq(SourceEntry(url,
      SourceRegistry.urlContent(raw), Wrap.Url, Wrap.UrlChunk)))
  }

  /** `file://` URLs are served from the LOCAL filesystem (the
    * reference's pycurl fetch handles the scheme natively,
    * reader.py:379-483) with the same HTML-strip pipeline and URL wrap
    * templates as remote URLs.
    */
  def readFileUrl(url: String): Dataset[SourceEntry] = {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(url.stripPrefix("file://")))
    val raw = SourceRegistry.decodeUtf8OrEmpty(bytes)
    spark.createDataset(Seq(SourceEntry(url,
      SourceRegistry.urlContent(raw), Wrap.Url, Wrap.UrlChunk)))
  }

  /** S10 `google:`: search-result URLs fan out partition-parallel,
    * same shape as the ldo thread fetch (reader.py:726-736,943-952).
    * No results → empty dataset (the reference logs and returns []).
    */
  def readGoogle(query: String): Dataset[SourceEntry] = {
    val urls = new GoogleSearch(spark, fetcher, env).searchUrls(query)
    val f = fetcher
    spark.createDataset(urls)
      .repartition(math.max(1, math.min(urls.size,
        spark.sparkContext.defaultParallelism)))
      .mapPartitions(_.map { url =>
        val raw = f.fetchWithRetry(url)
        SourceEntry(url, SourceRegistry.urlContent(raw),
          Wrap.UrlBacktick, Wrap.UrlBacktickChunk)
      })
  }

  /** `nm:` Debian new-maintainer question templates
    * (reader.py:875-907). Unknown keys error like the reference's
    * KeyError. Two questions pull companion sources: pp1e.PH9 reads
    * the GR vote page, pp2.BT6/BT8 read the BTS how-to pages. The
    * reference's pp1.PH7 additionally wget-downloads a licenses
    * tarball and reads the extracted directory; we read a local
    * `licenses` directory when one exists but never download
    * (side-effecting shell-out stays outside the engine).
    */
  def readNm(key: String): Dataset[SourceEntry] = {
    val content = NmTemplates.All.getOrElse(key,
      throw new NoSuchElementException(s"key not found: $key"))
    val base = spark.createDataset(Seq(
      SourceEntry(key, content, Wrap.Nm, Wrap.Nm)))
    val extras: Seq[Dataset[SourceEntry]] = key match {
      case "pp1.PH7" if new java.io.File("licenses").isDirectory =>
        Seq(readDirectory("licenses"))
      case "pp1e.PH9" =>
        Seq(readUrl("https://www.debian.org/vote/2006/vote_001"))
      case "pp2.BT6" | "pp2.BT8" =>
        Seq(read("https://www.debian.org/Bugs/Reporting"),
          read("https://www.debian.org/Bugs/Developer"))
      case _ => Seq.empty
    }
    extras.foldLeft(base)(_ unionByName _)
  }

  /** S6: command output, lines rstripped (reader.py:544-549). The
    * per-line rstrip is the ONLY normalization — `'\n'.join` over
    * `split('\n')` keeps a trailing empty line, so output ending in a
    * newline keeps it (r7 stripped it, which glued the closing fence
    * to the last diff line in the git-commit prompt).
    */
  def readCmd(cmd: String): Dataset[SourceEntry] = {
    // raw byte capture: Process.!! re-joins lines and ALWAYS appends a
    // final newline, so it cannot tell "1\n2\n3" from "1\n2\n3\n" —
    // the reference's check_output sees the exact stream
    val buf = new java.io.ByteArrayOutputStream()
    val code = (scala.sys.process.Process(Seq("sh", "-c", cmd)) #> buf).!
    if (code != 0)
      throw new RuntimeException(s"command failed with exit $code: $cmd")
    val out = new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    val content = PyText.splitLines(out).map(_.replaceAll("\\s+$", ""))
      .mkString("\n")
    spark.createDataset(Seq(SourceEntry(cmd, content, Wrap.Cmd, Wrap.CmdChunk)))
  }

  /** S12: stdin (driver-side). */
  def readStdin(): Dataset[SourceEntry] = {
    val content = scala.io.Source.stdin.getLines()
      .map(_.replaceAll("\\s+$", "")).mkString("\n")
    spark.createDataset(Seq(
      SourceEntry("stdin", content, Wrap.Stdin, Wrap.StdinChunk)))
  }

  /** U2: multi-spec accumulation in CLI order (cli.py:236-263) —
    * union in spec order with a stable `ord`.
    */
  def readMany(specs: Seq[String]): DataFrame = {
    require(specs.nonEmpty, "readMany needs at least one spec")
    specs.zipWithIndex.map { case (spec, i) =>
      read(spec).withColumn("specOrd", lit(i))
    }.reduce(_ unionByName _)
  }

}

/** S2: pluggable PDF text extraction (the reference's pypdf path,
  * reader.py:310-333). The build environment ships no PDF library, so
  * the default refuses with a clear wiring hint; a deployment binds
  * Apache PDFBox (or any extractor) here, the same seam pattern as
  * [[HttpFetcher]].
  */
trait PdfExtractor extends Serializable {
  def extractText(bytes: Array[Byte]): String
}

object PdfExtractor {
  object Unavailable extends PdfExtractor {
    override def extractText(bytes: Array[Byte]): String =
      throw new UnsupportedOperationException(
        "PDF extraction needs a PdfExtractor binding (e.g. Apache " +
          "PDFBox: PDFTextStripper.getText over Loader.loadPDF)")
  }

  /** Default binding: the pure-JVM [[PdfText]] parser — real text
    * extraction for unencrypted documents with plain or FlateDecode
    * content streams (the common case). Encrypted or fully
    * codec-encoded documents still refuse with the wiring hint, so a
    * deployment can bind a full library (PDFBox) for those.
    */
  object PureJvm extends PdfExtractor {
    override def extractText(bytes: Array[Byte]): String =
      PdfText.extract(bytes).getOrElse(Unavailable.extractText(bytes))
  }
}

/** Executor-side helpers — kept outside [[SourceRegistry]] so map
  * closures don't capture the (non-serializable) session holder.
  */
object SourceRegistry {
  def stripScheme(p: String): String = p.stripPrefix("file:")

  /** F12: strict UTF-8 decodability sniff (reader.py:225-239) —
    * undecodable content becomes an empty entry, not an error.
    */
  def decodeUtf8OrEmpty(bytes: Array[Byte]): String = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => "" }
  }

  /** File-content dispatch (reader.py:415-422): decodable text reads
    * as-is; undecodable `.pdf` goes to the extractor; anything else
    * degrades to an empty entry (S1 decision — the reference raises
    * TypeError, but a distributed directory walk must not die on one
    * stray binary).
    */
  def fileContent(path: String, bytes: Array[Byte],
                  pdf: PdfExtractor): String = {
    val text = decodeUtf8OrEmpty(bytes)
    if (text.nonEmpty || bytes.isEmpty) text
    else if (path.toLowerCase.endsWith(".pdf")) pdf.extractText(bytes)
    else ""
  }

  def looksLikeHtml(s: String): Boolean = {
    val head = s.take(512).toLowerCase
    head.contains("<html") || head.contains("<!doctype html")
  }

  /** URL content pipeline (reader.py:455-467): HTML → BeautifulSoup-
    * fidelity text extraction ([[HtmlText]]: stdlib-tokenizer parity,
    * full entity table, script/style/template exclusion) + the
    * reference's exact strip/squeeze/rstrip order; anything else
    * passes through.
    */
  def urlContent(raw: String): String =
    if (looksLikeHtml(raw)) HtmlText.htmlToText(raw)
    else raw
}

/** F10: the ldo range-spec expansion (reader.py:586-641):
  * `name/year/month` with `,` lists, `:` inclusive ranges, month `:`
  * alone = 01..12, zero-padded months; Cartesian product in
  * name-major order. Pure; feed the result to `explode` for the
  * distributed fetch fan-out (S8/S9).
  */
object SpecExpansion {
  def expand(spec: String): Seq[String] = {
    val parts = spec.split("/", -1)
    require(parts.length == 3, s"spec must be name/year/month: $spec")
    val Array(name, year, month) = parts
    if (!Seq(name, year, month).exists(p => p.contains(',') || p.contains(':')))
      return Seq(spec)
    require(!name.contains(':'), s"""Does not know how to expand "$name".""")
    val names = if (name.contains(',')) name.split(",").toSeq else Seq(name)
    val years =
      if (year.contains(':')) {
        val Array(a, b) = year.split(":")
        (a.toInt to b.toInt).map(_.toString)
      } else if (year.contains(',')) year.split(",").toSeq
      else Seq(year)
    val months =
      if (month == ":") (1 to 12).map(m => f"$m%02d")
      else if (month.contains(':')) {
        val Array(a, b) = month.split(":")
        (a.toInt to b.toInt).map(m => f"$m%02d")
      } else if (month.contains(',')) month.split(",").toSeq
      else Seq(month)
    for (n <- names; y <- years; m <- months) yield s"$n/$y/$m"
  }
}

/** F11: slice a build log between the `| Build |` and `| Changes |`
  * ASCII-box markers (reader.py:256-284), exclusive of the markers.
  */
object BuildLog {
  private val Start = "\\+[-]+\\+\\n\\| Build +\\|\\n\\+[-]+\\+".r
  private val End = "\\+[-]+\\+\\n\\| Changes +\\|\\n\\+[-]+\\+".r

  def extractBuildChanges(text: String): Option[String] =
    Start.findFirstMatchIn(text).map { sm =>
      End.findFirstMatchIn(text) match {
        case Some(em) => text.substring(sm.end, em.start)
        case None => text.substring(sm.end)
      }
    }
}
