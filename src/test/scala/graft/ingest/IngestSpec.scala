package graft.ingest

import graft.SparkTestBase

import java.nio.file.{Files, Path}

/** FIXTURES.md §9: directory tree with skiplist dirs + binary file;
  * sectioned policy-style doc; spec expansion; build-log slicing.
  */
class IngestSpec extends SparkTestBase {

  private def mkTree(): Path = {
    val root = Files.createTempDirectory("ingest")
    Files.writeString(root.resolve("a.txt"), "hello\nworld")
    Files.createDirectories(root.resolve("sub"))
    Files.writeString(root.resolve("sub/b.txt"), "nested")
    Files.createDirectories(root.resolve(".git"))
    Files.writeString(root.resolve(".git/config"), "secret")
    Files.createDirectories(root.resolve("__pycache__"))
    Files.writeString(root.resolve("__pycache__/c.pyc"), "junk")
    Files.write(root.resolve("blob.bin"), Array[Byte](0, -1, -2, -60, 1))
    root
  }

  test("readDirectory: skiplist pruned, binary → empty content (reader.py:353-376)") {
    val reg = new SourceRegistry(spark)
    val entries = reg.readDirectory(mkTree().toString).collect()
      .map(e => e.path.split('/').takeRight(1).head -> e.content).toMap
    assert(entries.keySet == Set("a.txt", "b.txt", "blob.bin"))
    assert(entries("a.txt") == "hello\nworld")
    assert(entries("blob.bin") == "")
  }

  test("readFile + wrap template matches reference layout") {
    val root = mkTree()
    val reg = new SourceRegistry(spark)
    val e = reg.readFile(root.resolve("a.txt").toString).head()
    assert(e.content == "hello\nworld")
    assert(e.wrapped ==
      s"Here is the contents of file `${e.path}`:\n```\nhello\nworld\n```\n")
  }

  test("read dispatch: cmd, missing spec error (reader.py:1029-1031)") {
    val reg = new SourceRegistry(spark)
    val e = reg.read("cmd:printf 'x  \\ny\\n'").head()
    // reference read_cmd: per-line rstrip, trailing newline PRESERVED
    // ('\n'.join over split('\n') keeps the final empty line)
    assert(e.content == "x\ny\n")
    intercept[java.io.FileNotFoundException](reg.read("no:such:thing"))
  }

  test("readUrl through fixture fetcher strips HTML; retry surfaces failures") {
    val reg = new SourceRegistry(spark, FixtureFetcher(Map(
      "https://x.test/page" ->
        "<!doctype html><html><head><style>p{}</style></head><body><p>Hi &amp; bye</p></body></html>")))
    val e = reg.readUrl("https://x.test/page").head()
    assert(e.content == "Hi & bye")
    val failing = new SourceRegistry(spark, new HttpFetcher {
      var calls = 0
      override def fetch(url: String): String = { calls += 1; throw new RuntimeException(s"boom$calls") }
    })
    val ex = intercept[RuntimeException](
      failing.readUrl("https://x.test/other")) // 3 attempts, fast wait not configurable here
    assert(ex.getMessage.startsWith("boom"))
  }

  test("file:// URLs serve local files, never the HTTP fetcher (reader.py:379-483)") {
    val root = mkTree()
    // NoNetworkFetcher default: a file:// spec routed to HTTP would throw
    val reg = new SourceRegistry(spark)
    val e = reg.read(s"file://$root/a.txt").head()
    assert(e.content == "hello\nworld")
    assert(e.template == graft.core.Wrap.Url) // URL wrap, like the reference
    val html = root.resolve("page.html")
    Files.writeString(html, "<!doctype html><html><body><p>Hi &amp; bye</p></body></html>")
    assert(reg.read(s"file://$html").head().content == "Hi & bye")
  }

  test("pdf dispatch reaches the PdfExtractor seam; default refuses clearly (reader.py:310-333)") {
    val root = mkTree()
    // %PDF magic followed by non-UTF-8 bytes → not decodable as text
    Files.write(root.resolve("doc.pdf"),
      "%PDF-1.4 ".getBytes ++ Array[Byte](-60, 0, -1, -2))
    val fake = new PdfExtractor {
      override def extractText(bytes: Array[Byte]): String =
        s"extracted ${bytes.length} bytes"
    }
    val reg = new SourceRegistry(spark, pdf = fake)
    val e = reg.read(root.resolve("doc.pdf").toString).head()
    assert(e.content == "extracted 13 bytes")
    // directory walks dispatch the same way
    val dirEntries = reg.readDirectory(root.toString).collect()
    assert(dirEntries.find(_.path.endsWith("doc.pdf"))
      .exists(_.content == "extracted 13 bytes"))
    // the DEFAULT binding is the pure-JVM parser: a real Flate PDF
    // decodes through the dispatcher with no explicit extractor...
    val real = java.nio.file.Paths.get(
      getClass.getResource("/pdf/simple_flate.pdf").toURI)
    val pdfPath = root.resolve("real.pdf")
    Files.copy(real, pdfPath)
    val bare = new SourceRegistry(spark)
    assert(bare.read(pdfPath.toString).head().content
      .contains("Hello, PDF world!"))
    // ...while undecodable ones still name the missing binding instead
    // of silently degrading
    val ex = intercept[org.apache.spark.SparkException](
      bare.readFile(root.resolve("doc.pdf").toString).head())
    assert(ex.getCause.getMessage.contains("PdfExtractor"))
    // but a BULK walk degrades the same corrupt PDF to an empty entry
    // instead of dying — one stray file must not kill the directory
    val walked = bare.readDirectory(root.toString).collect()
    assert(walked.find(_.path.endsWith("doc.pdf")).exists(_.content == ""))
    assert(walked.find(_.path.endsWith("real.pdf"))
      .exists(_.content.contains("Hello, PDF world!")))
  }

  test("google: API fan-out through fixtures; unconfigured and error payloads → empty (reader.py:678-736,943)") {
    val payload =
      """{"items": [{"link": "https://r.test/one"}, {"link": "https://r.test/two"},
        |{"notlink": 5}]}""".stripMargin
    val key = "k123"
    val cx = "cx456"
    val api = s"${GoogleSearch.ApiUrl}?key=$key&cx=$cx&q=spark+tuning"
    val envMap = Map("GOOGLE_SEARCH_API_KEY" -> key, "GOOGLE_CSE_ID" -> cx)
    val reg = new SourceRegistry(spark, FixtureFetcher(Map(
      api -> payload,
      "https://r.test/one" -> "<html><body>first result</body></html>",
      "https://r.test/two" -> "plain text two")),
      env = envMap.get)
    val entries = reg.read("google:spark tuning").collect().sortBy(_.path)
    assert(entries.map(_.path).toSeq ==
      Seq("https://r.test/one", "https://r.test/two"))
    assert(entries.map(_.content).toSeq == Seq("first result", "plain text two"))
    assert(entries.head.template == graft.core.Wrap.UrlBacktick)
    // bare google: falls back to the user question
    val viaQuestion = reg.read("google:", userQuestion = "spark tuning").collect()
    assert(viaQuestion.length == 2)
    intercept[IllegalArgumentException](reg.read("google:"))
    // no credentials → no results, no fetch attempts
    val unconfigured = new SourceRegistry(spark, FixtureFetcher(Map.empty),
      env = _ => None)
    assert(unconfigured.read("google:x").count() == 0)
    // API error payload → empty
    val errReg = new SourceRegistry(spark, FixtureFetcher(Map(
      s"${GoogleSearch.ApiUrl}?key=$key&cx=$cx&q=x" ->
        """{"error": {"message": "quota"}}""")), env = envMap.get)
    assert(errReg.read("google:x").count() == 0)
    // undecodable payload → empty
    val badReg = new SourceRegistry(spark, FixtureFetcher(Map(
      s"${GoogleSearch.ApiUrl}?key=$key&cx=$cx&q=x" -> "not json")),
      env = envMap.get)
    assert(badReg.read("google:x").count() == 0)
  }

  test("nm: question templates + companion sources (reader.py:875-907)") {
    val reg = new SourceRegistry(spark, FixtureFetcher(Map(
      "https://www.debian.org/vote/2006/vote_001" ->
        "<html><body>GR 2006 text</body></html>",
      "https://www.debian.org/Bugs/Reporting" -> "how to report",
      "https://www.debian.org/Bugs/Developer" -> "developer info")))
    val one = reg.read("nm:pp1.PH1").collect()
    assert(one.length == 1)
    assert(one.head.content.startsWith("What is Debian's approach to non-free software?"))
    assert(one.head.wrapped.startsWith(
      "Here is the question pp1.PH1 from Debian nm-templates:"))
    val ph9 = reg.read("nm:pp1e.PH9").collect().sortBy(_.path)
    assert(ph9.length == 2)
    assert(ph9.exists(_.content == "GR 2006 text"))
    val bt6 = reg.read("nm:pp2.BT6").collect()
    assert(bt6.length == 3)
    assert(bt6.map(_.content).toSet.contains("how to report"))
    intercept[NoSuchElementException](reg.read("nm:unknown.key"))
  }

  test("read_stdin: rstripped lines from redirected stdin (reader.py:241-253)") {
    val orig = System.in
    try {
      System.setIn(new java.io.ByteArrayInputStream(
        "line one  \nline two\t\nlast\n".getBytes("UTF-8")))
      val e = new SourceRegistry(spark).read("stdin").head()
      assert(e.content == "line one\nline two\nlast")
      assert(e.template == graft.core.Wrap.Stdin)
    } finally System.setIn(orig)
  }

  test("SpecExpansion: lists, ranges, all-months, product order (reader.py:603-641)") {
    assert(SpecExpansion.expand("debian-ai/2024/11") == Seq("debian-ai/2024/11"))
    assert(SpecExpansion.expand("debian-ai/2024,2025/11") ==
      Seq("debian-ai/2024/11", "debian-ai/2025/11"))
    assert(SpecExpansion.expand("debian-ai/2025/01:05") ==
      Seq("debian-ai/2025/01", "debian-ai/2025/02", "debian-ai/2025/03",
        "debian-ai/2025/04", "debian-ai/2025/05"))
    assert(SpecExpansion.expand("a,b/2024/:").length == 24)
    assert(SpecExpansion.expand("a/2024/:").take(2) == Seq("a/2024/01", "a/2024/02"))
    intercept[IllegalArgumentException](SpecExpansion.expand("a:b/2024/01"))
  }

  test("BuildLog slice between Build and Changes boxes (reader.py:256-284)") {
    val log = "prelude\n+------+\n| Build |\n+------+\nthe build body\n" +
      "+-------+\n| Changes |\n+-------+\ntail"
    assert(BuildLog.extractBuildChanges(log).contains("\nthe build body\n"))
    assert(BuildLog.extractBuildChanges("no markers").isEmpty)
    val noEnd = "x\n+--+\n| Build |\n+--+\nrest of file"
    assert(BuildLog.extractBuildChanges(noEnd).contains("\nrest of file"))
  }

  test("SectionedDoc: index scan + section extraction (policy.py:65-118)") {
    val doc = Seq(
      "Preamble text", "",
      "1. Introduction",
      "***************",
      "intro body line 1",
      "intro body line 2",
      "1.1. Scope",
      "===========",
      "scope body",
      "2. Second section",
      "*****************",
      "second body",
      "not-an-index heading",
      "---",
      "ignored because heading's first word lacks trailing dot"
    ).mkString("\n")
    val sd = new SectionedDoc(spark, doc)
    assert(sd.scanIndexes() == Seq("1", "1.1", "2"))
    assert(sd.section("1") ==
      Seq("1. Introduction", "***************", "intro body line 1",
        "intro body line 2", "1.1. Scope", "===========", "scope body")
        .mkString("\n"))
    // no later '===' separator exists, so the subsection runs to EOF
    // (policy.py:101-116: the loop only breaks on a next same-level sep)
    assert(sd.section("1.1") == Seq("1.1. Scope", "===========", "scope body",
      "2. Second section", "*****************", "second body",
      "not-an-index heading", "---",
      "ignored because heading's first word lacks trailing dot").mkString("\n"))
    assert(sd.section("2") ==
      Seq("2. Second section", "*****************", "second body",
        "not-an-index heading", "---",
        "ignored because heading's first word lacks trailing dot").mkString("\n"))
    assert(sd.section("9") == "")
  }
}
