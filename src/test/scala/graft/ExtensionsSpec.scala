package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SparkSessionExtensions wiring: the graft sketch expressions must be
  * callable from pure SQL once the extension is installed. Builds its own
  * session (extensions apply at session construction; the shared test
  * session can't retrofit them) over the shared SparkContext. */
class ExtensionsSpec extends AnyFunSuite {

  test("graft functions resolve through SparkSessionExtensions") {
    SparkSpec.session // ensure the shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
        .getOrCreate()
      val cos = s.sql(
        "SELECT graft_cosine(array(cast(1.0 as float), cast(0.0 as float)), " +
          "array(cast(1.0 as float), cast(0.0 as float))) AS c").head().getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-9)
      assert(s.sql("SELECT size(graft_shingle_hashes('a b c d', 2)) AS n")
        .head().getInt(0) == 3)
      assert(s.sql("SELECT graft_simhash64(array('x','y')) AS h")
        .head().getLong(0) != 0L)
      assert(s.sql("SELECT graft_hyperplane_signature(array(cast(0.5 as float)), 4, 42, 0) AS g")
        .head().getInt(0) >= 0)
      // non-literal size argument is a clear error, not a crash
      val e = intercept[Exception] {
        s.sql("SELECT graft_minhash(array('x'), cast(rand() * 4 as int))").head()
      }
      assert(e.getMessage.contains("integer literal"))
      assert(s.sql("SELECT size(graft_window_hashes('a b c d', 2)) AS n")
        .head().getInt(0) == 3)
      // hilbert from pure SQL agrees with the column API kernel
      val hSql = s.sql("SELECT graft_hilbert_index(3, 3L, 5L) AS h")
        .head().getLong(0)
      assert(hSql == org.apache.spark.sql.graft.GraftHashOps
        .hilbertIndex(Array(3L, 5L), 3))
      // entropy of a single repeated char is exactly 0 bits
      assert(s.sql("SELECT graft_char_entropy('aaaa') AS e")
        .head().getDouble(0) == 0.0)
      // blocklist scan from pure SQL: ids of the matched patterns
      assert(s.sql(
        "SELECT graft_ac_matches('the canary xyz sits', 'canary xyz', 'absent') AS m")
        .head().getSeq[Int](0) == Seq(0))
      val acErr = intercept[Exception] {
        s.sql("SELECT graft_ac_matches('t', lower('X'))").head()
      }
      assert(acErr.getMessage.contains("literal"))
      // the sketch functions also resolve inside the RBQL dialect surface
      // (Graft.query routes expressions through the session's analyzer)
      import s.implicits._
      val docs = Seq(("a b c d", 1L), ("a b", 2L)).toDF("text", "id")
      val out = graft.Graft.query(s,
        "SELECT a.id, size(graft_shingle_hashes(a.text, 2)) AS n_shingles " +
          "ORDER BY a.id", docs)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(out == Map(1L -> 3, 2L -> 1))
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
