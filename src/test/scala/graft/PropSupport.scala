package graft

import org.scalacheck.{Prop, Test => SCTest}

/** Minimal ScalaCheck↔ScalaTest bridge (scalatestplus is not in the
  * offline cache). `check` runs a Prop and fails the surrounding
  * ScalaTest assertion on the first counterexample.
  */
trait PropSupport {
  def check(name: String)(p: Prop): Unit = checkN(name, 200)(p)

  /** For properties where each case is itself a batch (e.g. one Spark
    * job over N generated documents), fewer outer cases suffice. */
  def checkN(name: String, cases: Int)(p: Prop): Unit = {
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(result.passed, s"$name: ${result.status}")
  }
}
