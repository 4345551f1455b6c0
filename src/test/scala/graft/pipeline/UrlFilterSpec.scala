package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** URL blocklist contracts: suffix semantics (exact entry, subdomain
  * of entry, but NOT a substring or sibling), null/unparseable-URL
  * totality, the filter/flag pair agreeing, and the probe kernel's
  * edge cases.
  */
class UrlFilterSpec extends SparkTestBase {

  private val bl = Seq("tracker.example", "ads.site.example")

  test("probe kernel: exact, subdomain, non-matches, edges") {
    val set = new java.util.HashSet[java.lang.String]()
    bl.foreach(set.add)
    assert(HostBlocked.probe("tracker.example", set))
    assert(HostBlocked.probe("cdn.tracker.example", set))
    assert(HostBlocked.probe("a.b.tracker.example", set))
    assert(HostBlocked.probe("ads.site.example", set))
    assert(HostBlocked.probe("x.ads.site.example", set))
    assert(!HostBlocked.probe("site.example", set), "parent not blocked")
    assert(!HostBlocked.probe("nottracker.example", set),
      "substring that is not a label boundary")
    assert(!HostBlocked.probe("tracker.example.org", set))
    assert(!HostBlocked.probe("", set))
  }

  test("flag and filter agree; nulls and junk URLs survive") {
    import spark.implicits._
    val df = Seq(
      (0L, "https://ok.example/x"),
      (1L, "https://tracker.example/pixel"),
      (2L, "https://cdn.tracker.example/p?q=1"),
      (3L, "not a url"),
      (4L, null.asInstanceOf[String]),
      (5L, "https://ads.site.example.org/a")
    ).toDF("id", "url")
    val flags = UrlFilter.flagBlockedUrls(df, "url", bl)
      .select("id", "blocked").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags == Map(0L -> false, 1L -> true, 2L -> true,
      3L -> false, 4L -> false, 5L -> false))
    val kept = UrlFilter.dropBlockedUrls(df, "url", bl)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 3L, 4L, 5L))
  }

  test("blocked flag is partition-invariant and plan stays shuffle-free") {
    import spark.implicits._
    val df = (0L until 200L).map(i =>
      (i, s"https://h$i.tracker.example/p")).toDF("id", "url")
    val a = UrlFilter.flagBlockedUrls(df, "url", bl)
      .agg(count_if(col("blocked"))).collect()(0).getLong(0)
    val b = UrlFilter.flagBlockedUrls(df.repartition(7), "url", bl)
      .agg(count_if(col("blocked"))).collect()(0).getLong(0)
    assert(a == 200L && b == 200L)
    val plan = UrlFilter.flagBlockedUrls(df, "url", bl)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"flag pass must not shuffle:\n$plan")
  }

  test("canonical URL: scheme/www/case/query/fragment/slash variants collapse") {
    import spark.implicits._
    val urls = Seq(
      "https://Example.COM/a/b",       // case
      "http://example.com/a/b",        // scheme
      "https://www.example.com/a/b/",  // www + trailing slash
      "https://example.com/a/b?utm=1", // query
      "https://example.com/a/b#frag",  // fragment
      "https://example.com",           // empty path -> "/"
      "https://example.com/",          // root slash -> "/"
      "https://other.com/a/b")         // genuinely different
    val got = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(UrlFilter.canonicalUrl(col("url")))
      .collect().map(_.getString(0))
    assert(got.take(5).toSet == Set("example.com/a/b"))
    assert(got(5) == "example.com/" && got(6) == "example.com/")
    assert(got(7) == "other.com/a/b")
    // dedup keeps the lowest id per canonical key
    val kept = UrlFilter.dropDupUrls(
        urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url"),
        "url", "id")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(0L, 5L, 7L))
  }
}
