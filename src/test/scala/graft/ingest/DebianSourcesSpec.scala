package graft.ingest

import graft.SparkTestBase

class DebianSourcesSpec extends SparkTestBase {

  private def fetcher = FixtureFetcher(Map(
    "https://bugs.debian.org/12345" ->
      """<html><body><h1>Bug #12345</h1>
        |<p class="msgreceived">system noise</p>
        |<div class="infmessage">more noise</div>
        |<p>real content line</p></body></html>""".stripMargin,
    "https://bugs.debian.org/src:foo" ->
      """<html><body><p>src page header</p>
        |<p>useful line</p>
        |<p>Options</p>
        |<p>useless tail</p></body></html>""".stripMargin,
    "https://wiki.archlinux.org/title/Tar" ->
      "<html><body><p>tar archives   </p></body></html>",
    "https://lists.debian.org/debian-ai/2024/11/threads.html" ->
      """<html><body><a href="msg00001.html">t1</a>
        |<a href="msg00002.html">t2</a>
        |<a href="other.html">skip</a>
        |<a href="threads2.html">next page</a></body></html>""".stripMargin,
    "https://lists.debian.org/debian-ai/2024/11/threads2.html" ->
      """<html><body><a href="msg00003.html">t3</a></body></html>""",
    "https://lists.debian.org/debian-ai/2024/11/msg00001.html" ->
      "<html><body>mail one</body></html>",
    "https://lists.debian.org/debian-ai/2024/11/msg00002.html" ->
      "<html><body>mail two</body></html>",
    "https://lists.debian.org/debian-ai/2024/11/msg00003.html" ->
      "<html><body>mail three</body></html>",
    "https://www.debian.org/doc/debian-policy/policy.txt" ->
      Seq("1. Intro", "********", "intro body",
        "2. Next", "*******", "next body").mkString("\n"),
    "https://www.debian.org/doc/manuals/developers-reference/developers-reference.en.txt" ->
      Seq("1. Scope", "********", "scope body",
        "2. More", "*******", "more body").mkString("\n")))

  private def registry = new SourceRegistry(spark, fetcher)

  test("bts: system messages removed for bug pages (reader.py:564-575)") {
    val e = registry.read("bts:12345").head()
    assert(e.content.contains("real content line"))
    assert(!e.content.contains("system noise"))
    assert(!e.content.contains("more noise"))
    assert(e.template == graft.core.Wrap.Bts)
  }

  test("bts src: truncates at the Options line (reader.py:578-582)") {
    val e = registry.read("bts:src:foo").head()
    assert(e.content.contains("useful line"))
    assert(!e.content.contains("Options"))
    assert(!e.content.contains("useless tail"))
  }

  test("archwiki: rstripped text (reader.py:739-754)") {
    val e = registry.read("archwiki:Tar").head()
    assert(e.content.contains("tar archives"))
    assert(!e.content.exists(_ == '<'))
  }

  test("ldo: thread index + next-page recursion + partition-parallel fetch (reader.py:586-670)") {
    val entries = registry.read("ldo:debian-ai/2024/11").collect()
      .sortBy(_.path)
    assert(entries.length == 3)
    assert(entries.map(_.content).toSeq ==
      Seq("mail one", "mail two", "mail three"))
    assert(entries.head.template == graft.core.Wrap.UrlBacktick)
  }

  test("ldo: one failed month is local — other months' URLs survive (reader.py:644-648)") {
    // months 11 and 12 expand; 12's index page is missing from the
    // fixtures, so its fetch fails after retries. The reference keeps
    // the successful months; a non-local `return` would discard them.
    val debian = new DebianSources(spark, fetcher)
    val urls = debian.fetchLdoThreads("debian-ai/2024/11:12")
    assert(urls.length == 3)
    assert(urls.forall(_.contains("/2024/11/")))
  }

  test("devref: developer-reference wording, section label quirk (reader.py:909-937)") {
    val one = registry.read("devref:1").head()
    assert(one.path == "Debian Developer Reference document [1]")
    assert(one.template == graft.core.Wrap.DevrefSection)
    assert(one.wrapped.startsWith(
      "Here is the Debian Developer Reference document, section 1:"))
    val full = registry.read("devref:all").head()
    assert(full.path == "Debian Developer Reference document")
    assert(full.wrapped.startsWith(
      "Here is the Debian Developer Reference document, full contents:"))
    val scan = registry.read("devref:").collect()
    assert(scan.map(_.path).toSeq ==
      Seq("Debian Developer Reference document [1]",
        "Debian Developer Reference document [2]"))
    // scan template is the comma-less variant with the empty spec baked in
    assert(scan.head.wrapped.startsWith(
      "Here is the Debian Developer Reference document :"))
  }

  test("policy: one section / all sections / full document (reader.py:970-1004)") {
    val one = registry.read("policy:1").head()
    assert(one.path == "Debian Policy section [1]")
    assert(one.content.startsWith("1. Intro"))
    val all = registry.read("policy:").collect()
    assert(all.map(_.path).toSeq ==
      Seq("Debian Policy section [1]", "Debian Policy section [2]"))
    val full = registry.read("policy:all").head()
    assert(full.content.contains("next body"))
  }

  test("caching fetcher: second read served from the TTL cache (reader.py:157-175)") {
    var calls = 0
    val counting = new HttpFetcher {
      override def fetch(url: String): String = { calls += 1; s"page for $url" }
    }
    val cache = new graft.cache.TtlCache(spark)
    val reg = new SourceRegistry(spark, new CachingFetcher(counting, cache))
    val a = reg.readUrl("https://x.test/a").head().content
    val b = reg.readUrl("https://x.test/a").head().content
    assert(a == b && calls == 1)
    reg.readUrl("https://x.test/other").head()
    assert(calls == 2)
    // expired entries are re-fetched after a purge
    cache.purgeExpired(new java.sql.Timestamp(System.currentTimeMillis() + 100L * 24 * 3600 * 1000))
    reg.readUrl("https://x.test/a").head()
    assert(calls == 3)
  }

  test("sbuild: latest .build file sliced between markers (reader.py:256-307)") {
    val dir = java.nio.file.Files.createTempDirectory("sbuild")
    val old = dir.resolve("old.build")
    val newer = dir.resolve("new.build")
    java.nio.file.Files.writeString(old,
      "x\n+--+\n| Build |\n+--+\nOLD BODY\n+--+\n| Changes |\n+--+\n")
    java.nio.file.Files.writeString(newer,
      "x\n+--+\n| Build |\n+--+\nNEW BODY\n+--+\n| Changes |\n+--+\n")
    java.nio.file.Files.setLastModifiedTime(old,
      java.nio.file.attribute.FileTime.fromMillis(1000000))
    val e = registry.read(s"sbuild:$dir/*.build").head()
    assert(e.content.contains("NEW BODY"))
    assert(!e.content.contains("OLD BODY"))
  }
}
