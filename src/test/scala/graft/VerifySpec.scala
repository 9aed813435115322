package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants of [[Verify]] that don't need a session. */
class VerifySpec extends AnyFunSuite {

  test("golden-pinned oracles ship the right set per scale: full at " +
      "sf0.01 AND sf0.1, dropped elsewhere (r13 verdict item 4)") {
    val atPin = Verify.oraclesFor("/root/testdata/sf0.01")
    val atSf01 = Verify.oraclesFor("/root/testdata/sf0.1")
    val elsewhere = Verify.oraclesFor("/root/testdata/sf1.0")
    assert(SparkEntry.goldenPinnedSf001.subsetOf(atPin.keySet))
    // the sf0.1 contract is the FULL 192: every query certifies there
    // (its own golden set / the real cosine oracle / reused gates)
    assert(atSf01.keySet == atPin.keySet,
      s"sf0.1 must certify every query; missing: ${atPin.keySet -- atSf01.keySet}")
    assert(atPin.keySet == SparkEntry.queries.keySet)
    // any OTHER scale drops exactly the pinned family (rows-only check)
    assert(SparkEntry.goldenPinnedSf001.forall(!elsewhere.keySet.contains(_)))
    assert(atPin.keySet -- elsewhere.keySet == SparkEntry.goldenPinnedSf001)
    // the sf0.1 set must ACTUALLY differ from the sf0.01 pins where the
    // data differs (captured values, not copied pins)...
    assert(atSf01("q_simhash") != atPin("q_simhash"))
    assert(atSf01("q_kmeans") != atPin("q_kmeans"))
    // ...reuse the scale-independent all-true gates unchanged...
    assert(atSf01("q_ann_recall") == atPin("q_ann_recall"))
    // ...and upgrade q_ann_topk to the real recomputable cosine oracle
    assert(atSf01("q_ann_topk").contains("list_transform"))
    // trailing slashes don't defeat the scale match
    assert(Verify.oraclesFor("/root/testdata/sf0.01/").keySet == atPin.keySet)
    assert(Verify.oraclesFor("/root/testdata/sf0.1/").keySet == atSf01.keySet)
  }

  test("every pinned name is a real query with a real oracle") {
    SparkEntry.goldenPinnedSf001.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"$k not in queries")
      assert(SparkEntry.oracleSql.contains(k), s"$k not in oracleSql")
    }
  }
}
