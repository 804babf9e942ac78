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

  /** The redaction patterns as (name, regex) — ONE home shared by the
    * maskers above and the [[piiCounts]] audit, so the audit can never
    * drift from what redaction actually removes.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
    "phone" ->
      "[0-9]{3}[ .()-]{1,2}[0-9]{3,4}[ .()-]{0,2}[0-9]{3,4}",
    "long_number" -> "[0-9]{6,}")

  /** Per-row PII hit counts, one column per pattern (the pre-redaction
    * audit: which sources leak what, and how much). regexp_count with
    * the SAME patterns redaction uses.
    */
  def piiCounts(c: Column): Seq[Column] =
    piiPatterns.map { case (name, p) =>
      regexp_count(c, lit(p)).as(s"n_$name")
    }
}
