package graft.functions

import graft.PropSupport
import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

class IsbnSpec extends AnyFunSuite with PropSupport {

  test("known ISBN-10 → ISBN-13 conversions") {
    // Public check-digit arithmetic examples.
    assert(Isbn.toIsbn13("0-306-40615-2") == "9780306406157")
    assert(Isbn.toIsbn13("0306406152") == "9780306406157")
    assert(Isbn.toIsbn13("043942089X") == "9780439420891")
  }

  test("valid ISBN-13 passes through cleaned") {
    assert(Isbn.toIsbn13("978-0-306-40615-7") == "9780306406157")
  }

  test("invalid inputs → null") {
    assert(Isbn.toIsbn13("0306406153") == null)       // bad check digit
    assert(Isbn.toIsbn13("not an isbn") == null)
    assert(Isbn.toIsbn13("97803064061") == null)      // wrong length
    assert(Isbn.toIsbn13(null) == null)
  }

  test("check digit X") {
    assert(Isbn.checkDigit10("043942089") == 'X')
    assert(Isbn.isValidIsbn10("043942089X"))
    assert(!Isbn.isValidIsbn10("0439420890"))
  }

  test("property: synthesized ISBN-10 round-trips to a valid ISBN-13") {
    val nineDigits = Gen.listOfN(9, Gen.numChar).map(_.mkString)
    check("isbn round-trip")(forAll(nineDigits) { core =>
      val isbn10 = Isbn.isbn10FromCore(core)
      val isbn13 = Isbn.toIsbn13(isbn10)
      Isbn.isValidIsbn10(isbn10) &&
        isbn13 != null && Isbn.isValidIsbn13(isbn13) &&
        isbn13.startsWith("978" + core)
    })
  }
}
