package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text cleaning + PII redaction for training corpora — the hygiene
  * stage between ingest and tokenization. Pure codegen'd expressions;
  * regex patterns restricted to the dialect-portable subset (character
  * classes, quantifiers, alternation) so the DuckDB twin matches
  * byte-for-byte.
  */
object Clean {

  /** Normalize: lowercase, collapse whitespace runs, trim. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Strip control characters (keep printable + space). */
  def stripControl(c: Column): Column =
    regexp_replace(c, "[\\x00-\\x1f\\x7f]", "")

  /** Redact email addresses. */
  def maskEmails(c: Column): Column =
    regexp_replace(c, "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
      "<EMAIL>")

  /** Redact phone-like numbers: digit groups WITH separators (a plain
    * digit run is an id/account, not a phone — maskLongNumbers' job).
    */
  def maskPhones(c: Column): Column =
    regexp_replace(c,
      "[0-9]{3}[ .()-]{1,2}[0-9]{3,4}[ .()-]{0,2}[0-9]{3,4}", "<PHONE>")

  /** Redact long digit runs (ids, accounts). */
  def maskLongNumbers(c: Column): Column =
    regexp_replace(c, "[0-9]{6,}", "<NUM>")

  /** The standard hygiene chain: control-strip → redact → normalize. */
  def hygiene(c: Column): Column =
    normalizeText(maskLongNumbers(maskPhones(maskEmails(stripControl(c)))))
}
