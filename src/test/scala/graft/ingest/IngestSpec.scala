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
    assert(e.content == "x\ny")
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
