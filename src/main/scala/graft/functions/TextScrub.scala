package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for text corpora — the scrubbing pass of a
  * training-data pipeline (emails, IPv4 addresses, phone-like and long
  * digit runs → typed placeholder tokens).
  *
  * Everything compiles to native `regexp_replace` / `regexp_count`
  * chains: codegen'd, no UDFs, a pure linear projection that fuses into
  * the scan stage — the filter/projection cost model of a 100 TB corpus
  * scrub is exactly one pass over the text bytes. Patterns avoid
  * lookaround/backreferences so they run identically on RE2-based
  * engines (DuckDB, Go) as on the JVM.
  *
  * Order matters and is fixed: emails before phone/digit runs (an email
  * local part may contain digits), IPv4 before digit runs (an IP is
  * digit runs joined by dots), phones before bare digit runs (a phone
  * match contains separators a digit run would split on).
  */
object TextScrub {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern =
    "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  /** +country, separators, 7+ digits total — e.g. +1-555-867-5309,
    * (555) 867 5309. The optional leading `\(?` plus ')' in BOTH
    * separator classes covers the bare-parenthesized form: a match may
    * start at '(' and the first separator may be ") ". */
  val PhonePattern =
    "\\+?\\(?[0-9]{1,3}[-. ()]{1,2}[0-9]{2,4}[-. ()]{1,2}[0-9]{2,4}[-. ]?[0-9]{2,6}"
  /** Bare runs of ≥ 7 digits (account numbers, SSN-ish) left over after
    * the structured patterns. */
  val LongDigitPattern = "[0-9]{7,}"

  val EmailToken = "[EMAIL]"
  val IpToken = "[IP]"
  val PhoneToken = "[PHONE]"
  val NumberToken = "[NUMBER]"

  /** The redaction pipeline's intermediate stages, in precedence order:
    * `stages(i)` is the text with the first i categories redacted —
    * ONE definition of the order-sensitive chain, so the scrub and the
    * audit can never drift apart. */
  private def stages(text: Column): Seq[Column] = {
    val noEmail = regexp_replace(text, EmailPattern, EmailToken)
    val noIp = regexp_replace(noEmail, Ipv4Pattern, IpToken)
    val noPhone = regexp_replace(noIp, PhonePattern, PhoneToken)
    val clean = regexp_replace(noPhone, LongDigitPattern, NumberToken)
    Seq(text, noEmail, noIp, noPhone, clean)
  }

  /** Redact all PII patterns from a text column (see class doc for why
    * replacement order is significant). Idempotent: the placeholder
    * tokens contain no scrubbable characters. */
  def scrub(text: Column): Column = stages(text).last

  /** Per-category PII hit counts `(n_emails, n_ips, n_phones, n_digit_runs)`
    * — the audit/reporting side of the scrub, applied with the same
    * precedence (each count is taken on the text with the
    * higher-precedence categories already redacted). */
  def piiCounts(text: Column): Seq[Column] = {
    val st = stages(text)
    Seq(
      regexp_count(st(0), lit(EmailPattern)).as("n_emails"),
      regexp_count(st(1), lit(Ipv4Pattern)).as("n_ips"),
      regexp_count(st(2), lit(PhonePattern)).as("n_phones"),
      regexp_count(st(3), lit(LongDigitPattern)).as("n_digit_runs"))
  }
}
