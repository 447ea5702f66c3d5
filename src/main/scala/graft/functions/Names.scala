package graft.functions

/** Personal-name parsing — F1/F4/F5/F6 from SURVEY.md §2.7.
  *
  * Semantics follow the reference's behavior (citations per function);
  * implementations are original Scala. All functions are pure (no Spark
  * imports) so they unit-test without a session and register cleanly as
  * UDFs (see [[GraftFunctions]]).
  */
object Names {

  /** Parsed personal name: the name with any lifespan removed, plus the
    * birth/death years when present ("Baxter, Charles, 1947-").
    */
  final case class ParsedName(name: String, birth: Option[String], death: Option[String])

  // Ref viaf.py:50 LIFESPAN = ([0-9]*)\??-([0-9]*)[?.;]*$ applied with
  // `search` (so it anchors at end of string only).
  private val Lifespan = """([0-9]*)\??-([0-9]*)[?.;]*$""".r

  private def parseLifespanWith(re: scala.util.matching.Regex,
                                s: String): ParsedName = {
    if (s == null) return ParsedName(null, None, None)
    val trimmed = s.trim
    re.findFirstMatchIn(trimmed) match {
      case Some(m) =>
        var name = trimmed.substring(0, m.start).trim
        if (name.endsWith(",")) name = name.dropRight(1).trim
        def yr(g: String): Option[String] = Option(g).filter(_.nonEmpty)
        ParsedName(name, yr(m.group(1)), yr(m.group(2)))
      case None =>
        var name = trimmed
        if (name.endsWith(",")) name = name.dropRight(1).trim
        ParsedName(name, None, None)
    }
  }

  /** F1 lifespan extraction (ref `viaf.py:71-96`, behavior spec in
    * `tests/test_viaf.py:32-80`):
    * "Baxter, Charles, 1947-"  -> ("Baxter, Charles", Some(1947), None)
    * "Mace, Daniel, -1753"     -> ("Mace, Daniel", None, Some(1753))
    * "Anonymous, ?-?"          -> ("Anonymous", None, None)
    * Trailing comma left by the strip is removed.
    */
  def parseLifespan(s: String): ParsedName = parseLifespanWith(Lifespan, s)

  // Ref oclc/classify.py:64 LIFESPAN = ([0-9]+)-([0-9]*)[.;]?$ — birth
  // digits REQUIRED (unlike viaf.py's optional-birth form above).
  private val ClassifyLifespan = """([0-9]+)-([0-9]*)[.;]?$""".r

  /** The Classify path's stricter lifespan strip
    * (`oclc/classify.py:685-699`): birth year required, so death-only
    * forms like "Mace, Daniel, -1753" keep the digits as part of the
    * name — intentionally different from [[parseLifespan]] (the VIAF
    * path), which strips them. Same strip logic, different regex. */
  def parseClassifyLifespan(s: String): ParsedName =
    parseLifespanWith(ClassifyLifespan, s)

  /** F6 wikipedia name → display name (ref `viaf.py:639-644`):
    * "Bob_Jones_(Author)" -> "Bob Jones". Only the LAST parenthetical is
    * dropped (rindex in the reference).
    */
  def wikipediaNameToDisplayName(wikipediaName: String): String = {
    if (wikipediaName == null) return null
    val display = wikipediaName.replace("_", " ")
    val i = display.lastIndexOf(" (")
    if (i >= 0) display.substring(0, i) else display
  }

  // Corporate-name markers. The reference delegates to
  // core.util.personal_names.is_corporate_name (submodule not vendored);
  // markers chosen from the same domain: publishers/institutions that
  // appear in bibliographic author fields (e.g. test_viaf.py:133
  // "simple corporate entry").
  private val CorporateMarkers = Seq(
    "company", "co.", "corporation", "corp.", "inc.", "incorporated",
    "ltd.", "limited", "llc", "press", "publishers", "publishing",
    "university", "institute", "society", "association", "foundation",
    "museum", "library", "committee", "council", "bureau", "department",
    "ministry", "agency", "editors", "staff")

  /** F4 corporate-name detection: a name that names an organization, not
    * a person (org names must not be run through person-name heuristics,
    * ref `canonicalize.py:59-61`).
    */
  def isCorporateName(name: String): Boolean = {
    if (name == null) return false
    val l = " " + name.toLowerCase.trim + " "
    CorporateMarkers.exists(m => l.contains(" " + m + " ") || l.contains(" " + m + ",")) ||
      l.trim.endsWith(")") && l.contains("(firm")
  }

  /** F4 name tidy: trim whitespace and trailing comma/period clutter
    * (ref usage `canonicalize.py:14-19` name_tidy; periods kept when part
    * of an initial, e.g. "Smythe, J. P." stays).
    */
  def nameTidy(name: String): String = {
    if (name == null) return null
    var n = name.trim
    while (n.endsWith(",") || n.endsWith(";")) n = n.dropRight(1).trim
    // A single trailing period is clutter unless it closes an initial
    // ("J. P." keeps its final period).
    if (n.endsWith(".") && n.length >= 3) {
      val beforeDot = n.charAt(n.length - 2)
      val isInitial = beforeDot.isUpper &&
        (n.length == 2 || !n.charAt(n.length - 3).isLetter)
      if (!isInitial) n = n.dropRight(1).trim
    }
    n
  }

  private val NameSuffixes = Set("jr", "jr.", "sr", "sr.", "ii", "iii", "iv", "md", "m.d.", "phd", "ph.d.")

  /** F4 display name → sort name heuristic fallback (ref
    * `canonicalize.py:126-129` last resort when no service resolves):
    * "Bill O'Reilly" -> "O'Reilly, Bill"; corporate names and
    * already-sorted single-token names pass through; generational
    * suffixes stay with the given names ("Martin Luther King Jr." ->
    * "King, Martin Luther Jr.").
    */
  def displayNameToSortName(displayName: String): String = {
    if (displayName == null) return null
    val name = nameTidy(displayName)
    if (name.isEmpty || isCorporateName(name) || name.contains(",")) return name
    val parts = name.split("\\s+").toList
    if (parts.length < 2) return name
    val (core, suffixes) = parts.partition(p => !NameSuffixes.contains(p.toLowerCase))
    if (core.isEmpty) return name
    val family = core.last
    val given = core.dropRight(1) ++ suffixes
    if (given.isEmpty) family else family + ", " + given.mkString(" ")
  }

  /** F5 primary-author extraction (ref `canonicalize.py:45-86`): from an
    * author string that may contain several people, extract the first.
    * "Bill O'Reilly with Martin Dugard" -> "Bill O'Reilly";
    * "Tolkien, J. R. R." stays whole (comma is a sort-name comma, not a
    * separator, when either side lacks a space).
    */
  def primaryAuthorName(authorName: String): String = {
    if (authorName == null || authorName.isEmpty) return authorName
    if (isCorporateName(authorName)) return authorName
    var name = authorName
    for (splitter <- Seq(" with ", " and "))
      if (name.contains(splitter)) name = name.split(splitter, 2)(0)
    val names = name.split(", ", -1)
    val looksLikeSortName = names.length == 2 && names.exists(!_.contains(" "))
    if (!looksLikeSortName) name = names(0)
    if (name.endsWith(",")) name = name.dropRight(1)
    name
  }
}
