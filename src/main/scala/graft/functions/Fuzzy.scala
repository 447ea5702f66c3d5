package graft.functions

/** F3 fuzzy match ratios (ref `viaf.py:326-388` contributor_name_match_ratio,
  * `canonicalize.py:261-265` title tiebreaks; thresholds 60/80/90 used by
  * callers). The reference uses fuzzywuzzy; this is an original
  * Levenshtein-normalized implementation with the same 0–100 scale and
  * the same threshold discipline.
  */
object Fuzzy {

  /** Classic dynamic-programming Levenshtein distance, two-row rolling
    * buffer — O(min(m,n)) space so it's safe inside a per-row UDF.
    */
  def levenshtein(a: String, b: String): Int = {
    if (a == null || b == null) return math.max(
      Option(a).map(_.length).getOrElse(0), Option(b).map(_.length).getOrElse(0))
    if (a == b) return 0
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    var prev = Array.tabulate(s.length + 1)(identity)
    var cur = new Array[Int](s.length + 1)
    var j = 1
    while (j <= t.length) {
      cur(0) = j
      var i = 1
      while (i <= s.length) {
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) 0 else 1
        cur(i) = math.min(math.min(cur(i - 1) + 1, prev(i) + 1), prev(i - 1) + cost)
        i += 1
      }
      val tmp = prev; prev = cur; cur = tmp
      j += 1
    }
    prev(s.length)
  }

  /** Similarity ratio 0–100: 100·(1 − lev/maxLen). 100 iff equal;
    * 0 for totally different strings of equal length. */
  def ratio(a: String, b: String): Int = {
    if (a == null && b == null) return 100
    if (a == null || b == null) return 0
    val maxLen = math.max(a.length, b.length)
    if (maxLen == 0) 100
    else math.round(100.0 * (1.0 - levenshtein(a, b).toDouble / maxLen)).toInt
  }

  /** Token-sort ratio: ratio over whitespace tokens sorted — order-
    * insensitive, so "Dugard, Martin" vs "Martin Dugard," matches high.
    * Tokens are lower-cased and stripped of non-alphanumerics first.
    */
  def tokenSortRatio(a: String, b: String): Int =
    ratio(tokenSortKey(a), tokenSortKey(b))

  private[functions] def tokenSortKey(s: String): String = {
    if (s == null) return null
    s.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).sorted.mkString(" ")
  }

  /** Contributor-name match ratio (ref usage `viaf.py:326-388`): names
    * are compared order-insensitively after unicode/case normalization,
    * since sort names and display names permute tokens.
    */
  def contributorNameMatchRatio(a: String, b: String): Int =
    tokenSortRatio(TextNorm.normalizeForMatching(a), TextNorm.normalizeForMatching(b))

  /** Title match ratio (ref usage `canonicalize.py:261-265`,
    * `scripts.py:336-344`): sequence matters for titles, so a plain
    * normalized ratio (no token sort).
    */
  def titleMatchRatio(a: String, b: String): Int =
    ratio(TextNorm.normalizeForMatching(a), TextNorm.normalizeForMatching(b))

  /** Identical strings bar periods and case (ref `viaf.py:127-130`). */
  def nameMatches(a: String, b: String): Boolean =
    a != null && b != null &&
      a.replace(".", "").toLowerCase == b.replace(".", "").toLowerCase
}
