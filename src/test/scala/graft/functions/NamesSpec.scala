package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Example-table tests in the reference's style (behavior spec from
  * `tests/test_viaf.py:32-80` and `canonicalize.py:45-86` docstrings).
  */
class NamesSpec extends AnyFunSuite {

  private def lifespan(s: String, name: String,
                       birth: Option[String] = None,
                       death: Option[String] = None): Unit = {
    val p = Names.parseLifespan(s)
    assert(p.name == name, s"name for <$s>")
    assert(p.birth == birth, s"birth for <$s>")
    assert(p.death == death, s"death for <$s>")
  }

  test("lifespan: birth only") {
    lifespan("Baxter, Charles, 1947-", "Baxter, Charles", Some("1947"))
    lifespan("William, Prince, Duke of Cambridge, 1982-",
      "William, Prince, Duke of Cambridge", Some("1982"))
  }

  test("lifespan: birth and death") {
    lifespan("Schlesinger, Arthur M., Jr. (Arthur Meier), 1917-2007",
      "Schlesinger, Arthur M., Jr. (Arthur Meier)", Some("1917"), Some("2007"))
    lifespan("Windsor, Edward, Duke of, 1894-1972",
      "Windsor, Edward, Duke of", Some("1894"), Some("1972"))
  }

  test("lifespan: trailing period after death year") {
    lifespan("Augustine, of Hippo, Saint, 354-430.",
      "Augustine, of Hippo, Saint", Some("354"), Some("430"))
  }

  test("lifespan: death only") {
    lifespan("Mace, Daniel, -1753", "Mace, Daniel", None, Some("1753"))
  }

  test("lifespan: both unknown / uncertain") {
    lifespan("Anonymous, ?-?", "Anonymous")
    lifespan("Bach, P. D. Q., 1807?-1742?", "Bach, P. D. Q.",
      Some("1807"), Some("1742"))
  }

  test("lifespan: plain names pass through") {
    lifespan("Korman, Gordon", "Korman, Gordon")
    lifespan("Smythe, J. P. (James P.)", "Smythe, J. P. (James P.)")
  }

  test("wikipedia name to display name") {
    assert(Names.wikipediaNameToDisplayName("Bob_Jones_(Author)") == "Bob Jones")
    assert(Names.wikipediaNameToDisplayName("Ada_Lovelace") == "Ada Lovelace")
    // only the LAST parenthetical is dropped
    assert(Names.wikipediaNameToDisplayName("John_(X)_Smith_(writer)") == "John (X) Smith")
  }

  test("primary author: collaboration splitters") {
    assert(Names.primaryAuthorName("Bill O'Reilly with Martin Dugard") == "Bill O'Reilly")
    assert(Names.primaryAuthorName("Ann Leckie and John Scalzi") == "Ann Leckie")
  }

  test("primary author: sort-name comma is kept") {
    assert(Names.primaryAuthorName("Tolkien, J. R. R.") == "Tolkien, J. R. R.")
    assert(Names.primaryAuthorName("Le Guin, Ursula") == "Le Guin, Ursula")
  }

  test("primary author: display-name comma list picks the first") {
    assert(Names.primaryAuthorName("Jane Smith, John Jones") == "Jane Smith")
  }

  test("primary author: null/empty/corporate") {
    assert(Names.primaryAuthorName(null) == null)
    assert(Names.primaryAuthorName("") == "")
    assert(Names.primaryAuthorName("Oxford University Press") == "Oxford University Press")
  }

  test("display name to sort name") {
    assert(Names.displayNameToSortName("Bill O'Reilly") == "O'Reilly, Bill")
    assert(Names.displayNameToSortName("Ursula K. Le Guin") == "Guin, Ursula K. Le")
    // the tidy pass drops the suffix period before sorting
    assert(Names.displayNameToSortName("Martin Luther King Jr.") == "King, Martin Luther Jr")
    // already sorted or unsplittable → unchanged
    assert(Names.displayNameToSortName("Tolkien, J. R. R.") == "Tolkien, J. R. R.")
    assert(Names.displayNameToSortName("Madonna") == "Madonna")
    assert(Names.displayNameToSortName("Oxford University Press") == "Oxford University Press")
  }

  test("name tidy") {
    assert(Names.nameTidy("  Smith, Jane,  ") == "Smith, Jane")
    assert(Names.nameTidy("Smith, Jane.") == "Smith, Jane")
    assert(Names.nameTidy("Smythe, J. P.") == "Smythe, J. P.")
  }

  test("corporate detection") {
    assert(Names.isCorporateName("Penguin Publishing Group"))
    assert(Names.isCorporateName("University of Chicago"))
    assert(Names.isCorporateName("Acme Inc."))
    assert(!Names.isCorporateName("Jane Smith"))
    assert(!Names.isCorporateName("Baxter, Charles"))
  }
}
