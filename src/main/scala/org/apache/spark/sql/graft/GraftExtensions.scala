package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer: registers the graft sketch
  * expressions as SQL functions, so pure-SQL users (spark.sql, JDBC
  * endpoints, SQL files) can call them without the Scala column API.
  *
  * Enable with either
  *   SparkSession.builder.withExtensions(new GraftExtensions)
  * or the standard config
  *   --conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions
  *
  * Functions (all codegen'd native expressions, see HashExpressions):
  *   graft_cosine(array<float>, array<float>) → double
  *   graft_shingle_hashes(string, k) → array<long>
  *   graft_window_hashes(string, w) → array<long>
  *   graft_minhash(array<string>, n) → array<long>
  *   graft_minhash_longs(array<long>, n) → array<long>
  *   graft_simhash64(array<string>) → long
  *   graft_hyperplane_signature(array<float>, planes, seed, table) → int
  *   graft_hilbert_index(bits, c1, c2, …) → long
  *   graft_char_entropy(string) → double
  *   graft_ac_matches(string, 'p1', 'p2', …) → array<int>
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal")
  }

  private def longArg(e: Expression, fn: String, pos: Int): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case _ => throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be an integer literal")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float vectors"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine takes 2 arguments")
        CosineSimilarity(args(0), args(1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_shingle_hashes"),
      info("graft_shingle_hashes", "graft_shingle_hashes(text, k) - hashed distinct k-token shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_shingle_hashes takes 2 arguments")
        ShingleHashes(args(0), intArg(args(1), "graft_shingle_hashes", 1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_window_hashes"),
      info("graft_window_hashes", "graft_window_hashes(text, w) - positional rolling w-token window hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_window_hashes takes 2 arguments")
        WindowHashes(args(0), intArg(args(1), "graft_window_hashes", 1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_l2_normalize"),
      info("graft_l2_normalize", "graft_l2_normalize(vec) - L2-normalized float vector"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_l2_normalize takes 1 argument")
        L2Normalize(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("graft_nfc"),
      info("graft_nfc", "graft_nfc(text) - Unicode NFC normalization"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_nfc takes 1 argument")
        NfcNormalize(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(arr, n) - n-way minhash signature of a string array"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_minhash takes 2 arguments")
        MinHashSignature(args(0), intArg(args(1), "graft_minhash", 1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_minhash_longs"),
      info("graft_minhash_longs", "graft_minhash_longs(arr, n) - n-way minhash over pre-hashed shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_minhash_longs takes 2 arguments")
        MinHashSignatureLongs(args(0), intArg(args(1), "graft_minhash_longs", 1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "graft_simhash64(arr) - 64-bit simhash of a string array"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash64 takes 1 argument")
        SimHash64(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("graft_hyperplane_signature"),
      info("graft_hyperplane_signature",
        "graft_hyperplane_signature(vec, planes, seed, table) - LSH sign-bucket id"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "graft_hyperplane_signature takes 4 arguments")
        HyperplaneSignature(args(0),
          intArg(args(1), "graft_hyperplane_signature", 1),
          longArg(args(2), "graft_hyperplane_signature", 2),
          intArg(args(3), "graft_hyperplane_signature", 3))
      }))
    ext.injectFunction((FunctionIdentifier("graft_hilbert_index"),
      info("graft_hilbert_index",
        "graft_hilbert_index(bits, c1, c2, ...) - d-dim Hilbert curve position of long coords"),
      (args: Seq[Expression]) => {
        require(args.length >= 2,
          "graft_hilbert_index takes bits then 1..8 coordinates")
        HilbertIndex(args.tail, intArg(args.head, "graft_hilbert_index", 0))
      }))
    ext.injectFunction((FunctionIdentifier("graft_ac_matches"),
      info("graft_ac_matches",
        "graft_ac_matches(text, 'p1', 'p2', ...) - ids of blocklist patterns occurring in text (Aho-Corasick, O(text) at any list size)"),
      (args: Seq[Expression]) => {
        require(args.length >= 2,
          "graft_ac_matches takes text then at least one pattern literal")
        val pats = args.tail.map {
          case org.apache.spark.sql.catalyst.expressions.Literal(
            s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
          case _ => throw new IllegalArgumentException(
            "graft_ac_matches: patterns must be string literals")
        }
        AcMatchesInline(args.head, pats)
      }))
    ext.injectFunction((FunctionIdentifier("graft_char_entropy"),
      info("graft_char_entropy",
        "graft_char_entropy(text) - Shannon bits of the char distribution"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_char_entropy takes 1 argument")
        CharEntropy(args(0))
      }))
  }
}
