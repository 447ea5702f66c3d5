package graft.functions

import java.security.MessageDigest
import java.text.Normalizer

/** F4/F8/F9/F11 text normalization, permanent-work-id hashing, and messy
  * date-string year extraction. Pure Scala.
  */
object TextNorm {

  /** F11 Unicode NFKD fold + lowercase (ref `scripts.py:316-344`
    * normalized comparison): decompose, drop combining marks, lowercase.
    */
  def nfkdLower(s: String): String = {
    if (s == null) return null
    Normalizer.normalize(s, Normalizer.Form.NFKD)
      .replaceAll("\\p{M}+", "")
      .toLowerCase
  }

  /** Matching key: NFKD-lowercase, punctuation → space, collapse runs,
    * trim. Shared by the fuzzy ratios and the permanent work id so the
    * two agree on what "the same string" means.
    */
  def normalizeForMatching(s: String): String = {
    if (s == null) return null
    nfkdLower(s).replaceAll("[^a-z0-9]+", " ").trim
  }

  /** F8 permanent work id (ref `scripts.py:396-415` via
    * core.util.permanent_work_id; submodule impl not vendored, so the
    * scheme is: md5 of "<norm title>|<norm author>"). Deterministic and
    * whitespace/case/punctuation-insensitive — the property the
    * reference's stress test exercises (`scripts.py:457-474`).
    */
  def permanentWorkId(title: String, author: String): String = {
    val key = normalizeForMatching(Option(title).getOrElse("")) + "|" +
      normalizeForMatching(Option(author).getOrElse(""))
    md5Hex(key)
  }

  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // F7 — title unfluff (ref `viaf.py:235-273`, `oclc/classify.py:816-839`):
  // leading articles and trailing subtitle clutter removed before title
  // comparison; semicolons mark anthology compilations which the
  // reference disqualifies from title matching.
  private val LeadingArticles = Seq("the ", "a ", "an ")

  /** Strip leading articles + punctuation clutter from a title for
    * comparison purposes. */
  def unfluffTitle(title: String): String = {
    if (title == null) return null
    var t = nfkdLower(title).trim
    var changed = true
    while (changed) {
      changed = false
      LeadingArticles.find(t.startsWith).foreach { a =>
        t = t.substring(a.length); changed = true
      }
    }
    t.replaceAll("[\\p{Punct}]+$", "").trim
  }

  /** Anthology disqualification: " ; " separates multiple works in one
    * field (ref `oclc/classify.py:816-839`). */
  def isAnthologyTitle(title: String): Boolean =
    title != null && title.contains(" ; ")

  /** Title similarity on unfluffed forms, 0–1 (reference gate ≥ 0.25). */
  def titleSimilarity(a: String, b: String): Double = {
    val ua = unfluffTitle(a)
    val ub = unfluffTitle(b)
    if (ua == null || ub == null || ua.isEmpty || ub.isEmpty) 0.0
    else Fuzzy.ratio(ua, ub) / 100.0
  }

  private val EightDigits = """^\d{8}.*""".r

  /** F9 year extraction from messy date strings (ref
    * `oclc/linked_data.py:408-432` extract_year):
    * "1999,"       -> "1999"   (trailing comma stripped, len 4)
    * "19990401"    -> "1999"   (8+ digits: first four)
    * "1999-04-01"  -> "1999"   (split on - or /, first 4-char part)
    * Returns null when no 4-char component exists.
    */
  def extractYear(dateString: String): String = {
    if (dateString == null || dateString.isEmpty) return null
    var s = dateString
    if (s.endsWith(",")) s = s.dropRight(1)
    if (s.length == 4) return s
    s match {
      case EightDigits() => return s.substring(0, 4)
      case _ =>
    }
    for (sep <- Seq('-', '/')) {
      val parts = s.split(sep)
      if (parts.length > 1) {
        parts.find(_.length == 4) match {
          case Some(y) => return y
          case None =>
        }
      }
    }
    null
  }
}
