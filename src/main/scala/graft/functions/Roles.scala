package graft.functions

/** F2 role-bracket parsing with the default-role state machine, ref
  * `oclc/classify.py:360-529`. Pure Scala; the Spark-side use is an
  * `explode(parseMultiple(...))` over author strings.
  */
object Roles {

  // Role constants as used by the reference's Contributor class
  // (observed at oclc/classify.py:364-394 usage sites).
  val PrimaryAuthor = "Primary Author"
  val Author        = "Author"
  val Translator    = "Translator"
  val Illustrator   = "Illustrator"
  val Editor        = "Editor"
  val Unknown       = "Unknown"
  val ContributorR  = "Contributor"
  val Introduction  = "Author of introduction"
  val Artist        = "Artist"
  val Associated    = "Associated name"
  val Photographer  = "Photographer"
  val Compiler      = "Compiler"
  val Adapter       = "Adapter"
  val Narrator      = "Narrator"
  val Afterword     = "Author of afterword"
  val Performer     = "Performer"
  val Composer      = "Composer"
  val Lyricist      = "Lyricist"
  val Director      = "Director"
  val Actor         = "Actor"
  val Musician      = "Musician"
  val Producer      = "Producer"

  /** Roles that count as "author-like" for the default-role transition
    * (ref Contributor.AUTHOR_ROLES usage at `oclc/classify.py:438-440`).
    */
  val AuthorRoles: Set[String] = Set(PrimaryAuthor, Author)

  // Ref oclc/classify.py:364-394 ROLE_MAPPING.
  private val RoleMapping: Map[String, String] = Map(
    "Author" -> Author,
    "Translator" -> Translator,
    "Illustrator" -> Illustrator,
    "Editor" -> Editor,
    "Unknown" -> Unknown,
    "Contributor" -> ContributorR,
    "Author of introduction" -> Introduction,
    "Other" -> Unknown,
    "Creator" -> Author,
    "Artist" -> Artist,
    "Associated name" -> Associated,
    "Photographer" -> Photographer,
    "Compiler" -> Compiler,
    "Adapter" -> Adapter,
    "Editor of compilation" -> Editor,
    "Narrator" -> Narrator,
    "Author of afterword, colophon, etc." -> Afterword,
    "Performer" -> Performer,
    "Author of screenplay" -> Author,
    "Writer of added text" -> Author,
    "Composer" -> Composer,
    "Lyricist" -> Lyricist,
    "Author of dialog" -> Author,
    "Film director" -> Director,
    "Actor" -> Actor,
    "Musician" -> Musician,
    "Filmmaker" -> Director,
    "Producer" -> Producer,
    "Director" -> Director,
  )

  /** One parsed contributor: name (lifespan split out) + role list. */
  final case class ParsedContributor(
      name: String, birth: Option[String], death: Option[String],
      roles: Seq[String], defaultRoleUsed: Boolean)

  // Ref oclc/classify.py:360 ROLES = \[([^]]+)\]$ (search = end-anchored).
  private val RoleBracket = """\[([^\]]+)\]$""".r

  /** Parse one name with optional trailing role bracket, e.g.
    * "Wells, H. G. [Writer of added commentary; Translator]"
    * (ref `oclc/classify.py:485-514`). Unknown role names map to
    * [[Unknown]]; roles are de-duplicated but keep first-seen order
    * (the reference's list(set(...)) has no stable order — fixing one is
    * strictly more deterministic).
    */
  def parseOne(s: String, defaultRole: String = Author): ParsedContributor = {
    val trimmed = s.trim
    // classify.py's own lifespan regex (birth year REQUIRED), not the
    // VIAF one — death-only lifespans stay in the name on this path
    // (`oclc/classify.py:64,685-699`).
    RoleBracket.findFirstMatchIn(trimmed) match {
      case Some(m) =>
        val name = trimmed.substring(0, m.start).trim
        val roles = m.group(1).split(";").map(r => RoleMapping.getOrElse(r.trim, Unknown))
          .toSeq.distinct
        val p = Names.parseClassifyLifespan(name)
        ParsedContributor(p.name, p.birth, p.death, roles, defaultRoleUsed = false)
      case None =>
        val p = Names.parseClassifyLifespan(trimmed)
        val roles = if (defaultRole != null) Seq(defaultRole) else Seq.empty
        ParsedContributor(p.name, p.birth, p.death, roles, defaultRoleUsed = roles.nonEmpty)
    }
  }

  /** The default-role transition (ref `oclc/classify.py:420-463`):
    *  - a primary author was seen → future default is Author;
    *  - a non-author-like contributor → future default is Unknown;
    *  - author-like via default → stays Author;
    *  - author-like but explicit → Unknown (an author would have been
    *    given an explicit role too).
    */
  def defaultRoleTransition(roles: Seq[String], roleWasDefault: Boolean): String =
    if (roles.contains(PrimaryAuthor)) Author
    else if (!roles.exists(AuthorRoles.contains)) Unknown
    else if (roleWasDefault) Author
    else Unknown

  /** Parse a '|'-separated author list with the stateful default role:
    * the first unlabeled person is the primary author, later unlabeled
    * people depend on what came before (ref `oclc/classify.py:397-417`).
    * Order-dependent by design — callers must preserve input order
    * (SURVEY.md §7 hard-part 3).
    */
  def parseMultiple(authorString: String): Seq[ParsedContributor] = {
    if (authorString == null || authorString.isEmpty) return Seq.empty
    var defaultRole = PrimaryAuthor
    authorString.split("\\|").toSeq.map { author =>
      val c = parseOne(author, defaultRole)
      defaultRole = defaultRoleTransition(c.roles, c.defaultRoleUsed)
      c
    }
  }
}
