package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants of [[Verify]] that don't need a session. */
class VerifySpec extends AnyFunSuite {

  test("golden-pinned oracles ship only at the sf0.01 pin scale") {
    val atPin = Verify.oraclesFor("/root/testdata/sf0.01")
    val offPin = Verify.oraclesFor("/root/testdata/sf0.1")
    assert(SparkEntry.goldenPinnedSf001.subsetOf(atPin.keySet))
    assert(SparkEntry.goldenPinnedSf001.forall(!offPin.keySet.contains(_)))
    // only the pins are dropped — every other oracle survives either way
    assert(atPin.keySet -- offPin.keySet == SparkEntry.goldenPinnedSf001)
    // trailing slashes don't defeat the scale match
    assert(Verify.oraclesFor("/root/testdata/sf0.01/").keySet == atPin.keySet)
  }

  test("every pinned name is a real query with a real oracle") {
    SparkEntry.goldenPinnedSf001.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"$k not in queries")
      assert(SparkEntry.oracleSql.contains(k), s"$k not in oracleSql")
    }
  }
}
