package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection/redaction for training corpora — the standard scrub
  * pass (mask phone numbers and email addresses) expressed entirely in
  * codegen'd regexp built-ins, so it runs inside whole-stage codegen
  * with zero shuffle: a narrow map over the corpus at any scale.
  *
  * Patterns deliberately use only syntax with identical semantics in
  * Java regex and RE2 (character classes, bounded/greedy quantifiers —
  * no lookaround, no backrefs), so SQL oracles replay them exactly.
  */
object Pii {

  /** NANP-style dashed phone: NN-NNN-NNN-NNNN (the TPC-H c_phone
    * shape). */
  val PhonePattern: String = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Pragmatic RFC-lite email: local@domain.tld. */
  val EmailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  def phoneCount(c: Column): Column =
    regexp_count(c, lit(PhonePattern)).cast("int")

  def emailCount(c: Column): Column =
    regexp_count(c, lit(EmailPattern)).cast("int")

  /** Mask emails FIRST, then phones. Order matters one way only: an
    * email's local part may legally contain a phone-shaped substring
    * ("jane.25-989-741-2988@corp.com"), and masking the phone first
    * would break the email match and leak its remainder — while a
    * phone can never contain an email ('@' is not in the phone
    * grammar), and '[EMAIL]' contains no digits for the phone pass to
    * misread. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(c, EmailPattern, "[EMAIL]"),
      PhonePattern, "[PHONE]")
}
