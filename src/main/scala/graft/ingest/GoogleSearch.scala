package graft.ingest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** S10: Google Custom Search → URL list (reference
  * reader.py:678-736). The API call goes through the pluggable
  * [[HttpFetcher]] boundary like every other network source; the JSON
  * payload is parsed with Spark's `from_json` against the explicit
  * response schema. All failure modes return an empty list, matching
  * the reference: missing credentials, request failure, undecodable
  * payload, or an `error` object in the payload.
  *
  * Credentials resolve from the environment (same variable names as
  * the reference): GOOGLE_SEARCH_API_KEY / GOOGLE_API_KEY and
  * GOOGLE_SEARCH_CX / GOOGLE_CSE_ID.
  */
final class GoogleSearch(spark: SparkSession, fetcher: HttpFetcher,
                         env: String => Option[String] = k => sys.env.get(k)) {

  private val payloadType: DataType = DataType.fromDDL(
    "error STRUCT<message: STRING>, items ARRAY<STRUCT<link: STRING>>")

  private def credentials: Option[(String, String)] = for {
    key <- env("GOOGLE_SEARCH_API_KEY").orElse(env("GOOGLE_API_KEY"))
    cx <- env("GOOGLE_SEARCH_CX").orElse(env("GOOGLE_CSE_ID"))
  } yield (key, cx)

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  /** `google_search` (reader.py:678-723): search-result URLs, or empty
    * on any failure. Single GET, no retry (the reference uses a plain
    * `requests.get`, not its tenacity-wrapped fetch).
    */
  def searchUrls(query: String): Seq[String] = credentials match {
    case None => Seq.empty
    case Some((key, cx)) =>
      val url = s"${GoogleSearch.ApiUrl}?key=${enc(key)}&cx=${enc(cx)}&q=${enc(query)}"
      scala.util.Try(fetcher.fetch(url)).toOption
        .map { raw =>
          val parsed = spark.range(1)
            .select(from_json(lit(raw), payloadType).as("p"))
            .select(col("p.error.message").as("err"),
              col("p.items.link").as("links"))
            .head()
          if (parsed.isNullAt(0) && !parsed.isNullAt(1))
            parsed.getSeq[String](1).filter(l => l != null && l.nonEmpty)
          else Seq.empty[String] // malformed payload, or an error object
        }
        .getOrElse(Seq.empty)
  }
}

object GoogleSearch {
  /** reference reader.py:66. */
  val ApiUrl = "https://www.googleapis.com/customsearch/v1"
}
