package graft.functions

/** F10 ISBN validation and ISBN-10 → ISBN-13 normalization (ref
  * `oclc/linked_data.py:693-702` via isbnlib.to_isbn13, `monitor.py:93`).
  * Standard public check-digit arithmetic; original implementation.
  */
object Isbn {

  /** Strip hyphens/spaces, uppercase any x check char. */
  def clean(raw: String): String =
    if (raw == null) null else raw.replaceAll("[\\s-]", "").toUpperCase

  def isValidIsbn10(raw: String): Boolean = {
    val s = clean(raw)
    s != null && s.length == 10 &&
      s.substring(0, 9).forall(_.isDigit) &&
      (s.charAt(9).isDigit || s.charAt(9) == 'X') &&
      checkDigit10(s.substring(0, 9)) == s.charAt(9)
  }

  def isValidIsbn13(raw: String): Boolean = {
    val s = clean(raw)
    s != null && s.length == 13 && s.forall(_.isDigit) &&
      checkDigit13(s.substring(0, 12)) == s.charAt(12)
  }

  /** ISBN-10 check digit over the first 9 digits: (11 − Σ dᵢ·(10−i) mod 11)
    * mod 11, with 10 rendered as 'X'. */
  def checkDigit10(nineDigits: String): Char = {
    val sum = nineDigits.zipWithIndex.map { case (c, i) => (c - '0') * (10 - i) }.sum
    val r = (11 - sum % 11) % 11
    if (r == 10) 'X' else ('0' + r).toChar
  }

  /** ISBN-13 check digit over the first 12 digits: weights alternate 1,3. */
  def checkDigit13(twelveDigits: String): Char = {
    val sum = twelveDigits.zipWithIndex.map { case (c, i) =>
      (c - '0') * (if (i % 2 == 0) 1 else 3)
    }.sum
    ('0' + (10 - sum % 10) % 10).toChar
  }

  /** ISBN-10 → ISBN-13 ("978" prefix + recomputed check digit); a valid
    * ISBN-13 passes through cleaned; anything else → null (the reference
    * drops unnormalizable ISBNs, `oclc/linked_data.py:695-697`).
    */
  def toIsbn13(raw: String): String = {
    val s = clean(raw)
    if (s == null) null
    else if (isValidIsbn13(s)) s
    else if (isValidIsbn10(s)) {
      val base = "978" + s.substring(0, 9)
      base + checkDigit13(base)
    } else null
  }

  /** Build a full ISBN-10 from a 9-digit core (used to synthesize test
    * identifiers deterministically from integer keys). */
  def isbn10FromCore(nineDigits: String): String =
    nineDigits + checkDigit10(nineDigits)
}
