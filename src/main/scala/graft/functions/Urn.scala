package graft.functions

import java.net.{URLDecoder, URLEncoder}

/** URN codec for the lookup protocol (SURVEY.md §1.1 Identifier:
  * `Identifier.parse_urn/parse_urns` usage at `controller.py:344`,
  * `controller.py:513`, urn column at `controller.py:682`). Formats
  * observed at the usage sites:
  *  - `urn:isbn:<isbn13>`                       — ISBN identifiers
  *  - `urn:librarysimplified.org/terms/id/<type>/<id>` — generic typed
  *    identifiers (percent-encoded components)
  *  - `http(s)://...`                           — URI identifiers
  */
object Urn {

  final case class ParsedUrn(idType: String, identifier: String)

  private val GenericPrefix = "urn:librarysimplified.org/terms/id/"

  def format(idType: String, identifier: String): String = idType match {
    case "ISBN" => s"urn:isbn:${Isbn.clean(identifier)}"
    case "URI"  => identifier
    case t =>
      GenericPrefix +
        URLEncoder.encode(t, "UTF-8") + "/" +
        URLEncoder.encode(identifier, "UTF-8")
  }

  /** Parse a URN; null for unrecognizable input (the reference raises
    * and the controller reports the URN as unresolvable). */
  def parse(urn: String): ParsedUrn = {
    if (urn == null) return null
    val u = urn.trim
    if (u.startsWith("urn:isbn:")) {
      val isbn = Isbn.toIsbn13(u.substring("urn:isbn:".length))
      if (isbn == null) null else ParsedUrn("ISBN", isbn)
    } else if (u.startsWith(GenericPrefix)) {
      val rest = u.substring(GenericPrefix.length)
      val slash = rest.indexOf('/')
      if (slash <= 0 || slash == rest.length - 1) null
      else ParsedUrn(
        URLDecoder.decode(rest.substring(0, slash), "UTF-8"),
        URLDecoder.decode(rest.substring(slash + 1), "UTF-8"))
    } else if (u.startsWith("http://") || u.startsWith("https://")) {
      ParsedUrn("URI", u)
    } else null
  }
}
