package graft

import graft.mapreduce.LossyEchoFunctor

import java.nio.file.Files

class GraftFacadeSpec extends SparkTestBase {

  private def mkApp() = new Graft(spark,
    Files.createTempDirectory("graft_app").toString + "/store",
    embeddingDim = 32)

  test("retrieval add/ret end-to-end (retrieval.py:133-175 workflow)") {
    val app = mkApp()
    app.retrieveAdd("doc-a", "spark query optimization")
    app.retrieveAdd("doc-b", "cat pictures and memes")
    app.retrieveAdd("doc-a2", "spark query optimization")
    val hits = app.retrieveRet("spark query optimization", k = 2)
    assert(hits.length == 2)
    // identical text embeds identically → both 'spark' docs, sim ≈ 1
    assert(hits.map(_.source).toSet == Set("doc-a", "doc-a2"))
    assert(hits.forall(h => math.abs(h.sim - 1.0) < 1e-5))
    assert(app.vdbLs().count() == 3)
  }

  test("vdb dump writes id-subset JSON lines") {
    val app = mkApp()
    app.retrieveAdd("s1", "alpha")
    app.retrieveAdd("s2", "beta")
    val out = Files.createTempDirectory("dump").toString + "/out"
    app.vdbDump(out, includeVector = false, ids = Seq(2L))
    val rows = spark.read.json(out).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("source") == "s2")
  }

  test("gatherInformation: spec order preserved, ask appended last (cli.py:222-270)") {
    val dir = Files.createTempDirectory("gi")
    Files.writeString(dir.resolve("one.txt"), "first file")
    Files.writeString(dir.resolve("two.txt"), "second file")
    val app = mkApp()
    val prompt = app.gatherInformation(
      Seq(dir.resolve("two.txt").toString, dir.resolve("one.txt").toString),
      ask = Some("what do these say?")).get
    val posTwo = prompt.indexOf("second file")
    val posOne = prompt.indexOf("first file")
    val posAsk = prompt.indexOf("what do these say?")
    assert(posTwo >= 0 && posOne >= 0 && posAsk >= 0)
    assert(posTwo < posOne && posOne < posAsk)
    assert(prompt.contains("Here is the contents of file `"))
    // no specs, only ask
    assert(app.gatherInformation(Nil, Some("just ask")).contains("just ask"))
    assert(app.gatherInformation(Nil, None).isEmpty)
  }

  test("mapreduce over a directory spec with the lossy functor") {
    val dir = Files.createTempDirectory("mr")
    (1 to 4).foreach(i => Files.writeString(dir.resolve(s"f$i.txt"),
      s"document $i " + ("content " * 40)))
    val app = mkApp()
    val out = app.mapreduce(dir.toString, LossyEchoFunctor(2),
      question = Some("summarize"), chunkSize = 256)
    assert(out.nonEmpty && out.endsWith("\n\n"))
  }

  test("gitCommit assembles the reference prompt from a staged diff (cli.py:141-153)") {
    import scala.sys.process._
    val repo = Files.createTempDirectory("graft_git").toString
    def git(args: String*): Unit =
      assert(Process("git" +: args.toSeq, new java.io.File(repo),
        "GIT_AUTHOR_NAME" -> "t", "GIT_AUTHOR_EMAIL" -> "t@t",
        "GIT_COMMITTER_NAME" -> "t", "GIT_COMMITTER_EMAIL" -> "t@t").! == 0)
    git("init", "-q")
    Files.writeString(java.nio.file.Path.of(repo, "a.txt"), "hello\n")
    git("add", "a.txt")
    git("commit", "-qm", "Add greeting file")
    Files.writeString(java.nio.file.Path.of(repo, "a.txt"), "hello world\n")
    git("add", "a.txt")
    val app = mkApp()
    // identity functor: the returned "message" IS the prompt, so the
    // test can pin the reference's verbatim assembly
    val prompt = app.gitCommit(graft.mapreduce.EchoFunctor,
      cwd = Some(repo))
    assert(prompt.startsWith("Previous commit titles:\n```Add greeting file```\n"),
      prompt.take(120))
    assert(prompt.contains("Change diff:\n```\n"))
    assert(prompt.contains("-hello") && prompt.contains("+hello world"))
    // the diff's trailing newline survives readCmd (reader.py:544-549),
    // so the closing fence is NOT glued to the last diff line: the
    // exact '\n```\n\n' boundary into the instruction sentence
    assert(prompt.contains("\n```\n\nWrite a good git commit message"),
      prompt.takeRight(200))
    assert(prompt.endsWith("using the project style visible in previous " +
      "commits titles above."))
    // a real functor sees the same prompt and its output is returned
    val msg = app.gitCommit(new graft.mapreduce.TextFunctor {
      def apply(p: String): String = "Update greeting"
    }, cwd = Some(repo))
    assert(msg == "Update greeting")
  }

  test("deleteCache drops the session table and the persisted copy (cli.py:85-91)") {
    val app = mkApp()
    app.cache.put("k", "v")
    val p = java.nio.file.Files.createTempDirectory("dc").toString + "/cache.parquet"
    app.cache.save(p)
    assert(app.cache.size() == 1)
    app.deleteCache(Some(p))
    assert(app.cache.size() == 0)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
    // idempotent on a missing path
    app.deleteCache(Some(p))
  }

  test("replay round-trips a dumped session") {
    val app = mkApp()
    val s = new graft.session.ChatSession(spark)
    s.append("user", "q")
    s.append("assistant", "a")
    val p = Files.createTempDirectory("rp").resolve("sess.json").toString
    s.dump(p)
    assert(app.replay(p).count() == 2)
  }
}
