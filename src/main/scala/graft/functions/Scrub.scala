package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection/redaction over text columns — the standard pre-training
  * scrub pass (emails, URLs, phone-like numbers). Pure `regexp_*`
  * expressions: codegen'd, embarrassingly parallel, no UDF. Patterns are
  * RE2-compatible (no lookarounds) so the exact same regexes run in any
  * engine — the DuckDB oracle uses them verbatim.
  *
  * Redaction order matters: URLs first (they may contain '@' and digits),
  * then emails, then phone-like runs.
  */
object Scrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe   = "https?://[^\\s]+"
  val PhoneRe = "\\+?[0-9][0-9 .-]{7,}[0-9]"

  def emailCount(c: Column): Column = size(regexp_extract_all(c, lit(EmailRe), lit(0)))
  def urlCount(c: Column): Column   = size(regexp_extract_all(c, lit(UrlRe), lit(0)))
  def phoneCount(c: Column): Column = size(regexp_extract_all(c, lit(PhoneRe), lit(0)))

  /** Replace URLs/emails/phone-like runs with typed placeholder tokens. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** True when the text contains any detectable PII. */
  def hasPii(c: Column): Column =
    emailCount(c) > 0 || urlCount(c) > 0 || phoneCount(c) > 0
}
