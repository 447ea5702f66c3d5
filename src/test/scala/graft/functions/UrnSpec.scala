package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class UrnSpec extends AnyFunSuite {

  test("isbn urns normalize to ISBN-13") {
    assert(Urn.parse("urn:isbn:0-306-40615-2") == Urn.ParsedUrn("ISBN", "9780306406157"))
    assert(Urn.parse("urn:isbn:9780306406157") == Urn.ParsedUrn("ISBN", "9780306406157"))
    assert(Urn.parse("urn:isbn:not-an-isbn") == null)
  }

  test("generic typed urns round-trip with percent-encoding") {
    val urn = Urn.format("Overdrive ID", "abc/def 123")
    assert(urn.startsWith("urn:librarysimplified.org/terms/id/"))
    assert(Urn.parse(urn) == Urn.ParsedUrn("Overdrive ID", "abc/def 123"))
  }

  test("http uris pass through as URI identifiers") {
    assert(Urn.parse("https://example.org/x") ==
      Urn.ParsedUrn("URI", "https://example.org/x"))
    assert(Urn.format("URI", "https://example.org/x") == "https://example.org/x")
  }

  test("unrecognizable input is null, not an exception") {
    assert(Urn.parse("bogus:123") == null)
    assert(Urn.parse("urn:librarysimplified.org/terms/id/onlytype") == null)
    assert(Urn.parse(null) == null)
  }
}
