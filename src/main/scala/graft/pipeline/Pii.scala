package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PII detection and redaction for training-data curation: count and
  * replace e-mail addresses, IPv4 addresses, and phone numbers in a
  * text column. The patterns stay in the portable common subset of
  * Java regex and RE2 (no backrefs, no lookaround), so the DuckDB
  * oracle runs the very same expressions — and so would any RE2-based
  * scanner at the 100 TB tier.
  *
  * Scale shape: pure map-side string work inside whole-stage codegen —
  * `regexp_extract_all`/`regexp_replace` are native Catalyst
  * expressions, no UDF, no shuffle; redaction cost is one linear scan
  * of the text per pattern.
  */
object Pii {

  /** Local-part @ domain.tld — the pragmatic curation pattern, not a
    * full RFC 5322 parser (neither is any production scrubber's).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad with word boundaries; over-matches out-of-range
    * octets (e.g. 999.1.1.1) by design — redaction favors recall.
    */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** International-prefix phone shapes: `+CC-NNN-NNNN` and the NANP
    * 4-group `+CC-NNN-NNN-NNNN` (the optional middle group's greedy
    * match keeps the two alternatives unambiguous).
    */
  val PhoneRe = "\\+\\d{1,2}-\\d{3}-\\d{3,4}(-\\d{4})?"

  /** Append `n_emails`, `n_ips`, `n_phones` (counts in the ORIGINAL
    * text) and `scrubbed` (text with each category replaced by its
    * placeholder, applied e-mail → IP → phone).
    */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    def count(re: String) =
      size(regexp_extract_all(col(textCol), lit(re), lit(0))).cast(LongType)
    df.withColumn("n_emails", count(EmailRe))
      .withColumn("n_ips", count(Ipv4Re))
      .withColumn("n_phones", count(PhoneRe))
      .withColumn("scrubbed",
        regexp_replace(
          regexp_replace(
            regexp_replace(col(textCol), EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          PhoneRe, "<PHONE>"))
  }
}
