package graft

import org.scalacheck.{Prop, Test => SCTest}

/** Minimal ScalaCheck↔ScalaTest bridge (scalatestplus is not in the
  * offline cache). `check` runs a Prop and fails the surrounding
  * ScalaTest assertion on the first counterexample.
  */
trait PropSupport {
  def check(name: String)(p: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(result.passed, s"$name: ${result.status}")
  }
}
