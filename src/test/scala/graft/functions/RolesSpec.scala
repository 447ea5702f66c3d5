package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Behavior spec from `oclc/classify.py:360-529` (role brackets + the
  * default-role state machine across a '|'-separated author list).
  */
class RolesSpec extends AnyFunSuite {

  test("explicit role bracket is parsed and mapped") {
    val c = Roles.parseOne("Wells, H. G. [Translator]")
    assert(c.name == "Wells, H. G.")
    assert(c.roles == Seq(Roles.Translator))
    assert(!c.defaultRoleUsed)
  }

  test("multiple roles split on semicolon, unknown roles map to Unknown") {
    val c = Roles.parseOne("Smith, Jane [Writer of added commentary; Translator]")
    assert(c.roles == Seq(Roles.Unknown, Roles.Translator))
  }

  test("role synonyms collapse (Creator→Author, Filmmaker→Director)") {
    assert(Roles.parseOne("X [Creator]").roles == Seq(Roles.Author))
    assert(Roles.parseOne("X [Filmmaker]").roles == Seq(Roles.Director))
    assert(Roles.parseOne("X [Editor of compilation]").roles == Seq(Roles.Editor))
  }

  test("lifespan inside a role-bracketed name still parses") {
    val c = Roles.parseOne("Baxter, Charles, 1947- [Author]")
    assert(c.name == "Baxter, Charles")
    assert(c.birth.contains("1947"))
  }

  test("first unlabeled contributor is primary author") {
    val cs = Roles.parseMultiple("Twain, Mark")
    assert(cs.map(_.roles) == Seq(Seq(Roles.PrimaryAuthor)))
  }

  test("unlabeled after unlabeled primary → Author (default chain)") {
    val cs = Roles.parseMultiple("Twain, Mark|Stevenson, Robert Louis")
    assert(cs.map(_.roles) == Seq(Seq(Roles.PrimaryAuthor), Seq(Roles.Author)))
  }

  test("explicit author-like role breaks the default chain to Unknown") {
    // Second person: explicit Author → third person's default is Unknown
    // (an author would have been labeled too).
    val cs = Roles.parseMultiple("Twain, Mark|Finn, Huck [Author]|Sawyer, Tom")
    assert(cs(1).roles == Seq(Roles.Author))
    assert(cs(2).roles == Seq(Roles.Unknown))
  }

  test("non-author-like contributor flips the default to Unknown") {
    val cs = Roles.parseMultiple("Twain, Mark|Doe, Jane [Illustrator]|Roe, Rich")
    assert(cs(0).roles == Seq(Roles.PrimaryAuthor))
    assert(cs(1).roles == Seq(Roles.Illustrator))
    assert(cs(2).roles == Seq(Roles.Unknown))
  }

  test("empty / null author string") {
    assert(Roles.parseMultiple("").isEmpty)
    assert(Roles.parseMultiple(null).isEmpty)
  }
}
