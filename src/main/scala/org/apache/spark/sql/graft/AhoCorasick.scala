package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern matcher (Aho & Corasick 1975): one
  * automaton over the whole pattern set, built ONCE on the driver
  * (state count ≤ total pattern chars + 1) and broadcast; each row then
  * scans in O(text length) INDEPENDENT of pattern count — a 10 000-entry
  * canary/blocklist costs the same per row as one pattern, where a
  * `contains` disjunction pays O(patterns · text). The exact-substring
  * companion to the shingle-based containment detectors: benchmark
  * canary GUIDs, blocklisted URLs, fixed contamination markers.
  *
  * Scan-time structure is frozen to flat arrays (per-state sorted char
  * keys + parallel next-state ids, binary-searched) — no per-character
  * hashing or boxing in the hot loop. `out` sets are pre-collapsed
  * through the failure chain at build, so emission is O(matches). */
final class AcAutomaton(patternSeq: Seq[String]) extends Serializable {
  val patterns: Array[String] = patternSeq.toArray
  require(patterns.nonEmpty, "pattern set must be non-empty")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty strings")

  // --- build: trie + BFS failure links (mutable, driver-side only) ---
  private val (charKeys, nextState, failLink, outSets) = {
    import scala.collection.mutable
    val children = mutable.ArrayBuffer(mutable.TreeMap.empty[Char, Int])
    val out = mutable.ArrayBuffer[mutable.Set[Int]](mutable.Set.empty)
    patterns.zipWithIndex.foreach { case (p, pid) =>
      var v = 0
      p.foreach { c =>
        v = children(v).getOrElse(c, {
          children += mutable.TreeMap.empty[Char, Int]
          out += mutable.Set.empty
          children(v)(c) = children.size - 1
          children.size - 1
        })
      }
      out(v) += pid
    }
    val fail = Array.fill(children.size)(0)
    val queue = mutable.Queue.empty[Int]
    children(0).valuesIterator.foreach(queue += _)
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        val fv = children(f).get(c).filter(_ != v).getOrElse(0)
        fail(v) = fv
        out(v) ++= out(fv) // pre-collapse the failure chain
        queue += v
      }
    }
    (children.map(_.keysIterator.toArray).toArray,
      children.map(_.valuesIterator.toArray).toArray,
      fail,
      out.map(_.toArray.sorted).toArray)
  }

  /** Distinct ids of every pattern occurring in `text`, ascending. */
  def scan(text: String): Array[Int] = {
    val hit = new Array[Boolean](patterns.length)
    var nHits = 0
    var v = 0
    var i = 0
    val n = text.length
    while (i < n && nHits < patterns.length) {
      val c = text.charAt(i)
      var next = java.util.Arrays.binarySearch(charKeys(v), c)
      while (next < 0 && v != 0) {
        v = failLink(v)
        next = java.util.Arrays.binarySearch(charKeys(v), c)
      }
      v = if (next >= 0) nextState(v)(next) else 0
      val o = outSets(v)
      var j = 0
      while (j < o.length) {
        if (!hit(o(j))) { hit(o(j)) = true; nHits += 1 }
        j += 1
      }
      i += 1
    }
    val res = new Array[Int](nHits)
    var k = 0
    var p = 0
    while (p < hit.length) {
      if (hit(p)) { res(k) = p; k += 1 }
      p += 1
    }
    res
  }
}

object AcOps {
  /** Expression kernel: scan and wrap as Catalyst array data. */
  def acScan(ac: AcAutomaton, input: UTF8String): ArrayData = {
    val ids = ac.scan(input.toString)
    val boxed = new Array[Any](ids.length)
    var i = 0
    while (i < ids.length) { boxed(i) = ids(i); i += 1 }
    new GenericArrayData(boxed)
  }
}

/** [[AcMatches]] with the automaton built INLINE from a literal
  * pattern list instead of a broadcast — the SQL-surface face
  * (`graft_ac_matches(text, 'p1', 'p2', …)` via GraftExtensions),
  * where no broadcast handle exists at function-resolution time. The
  * automaton is a transient lazy val: each executor builds it once per
  * task-deserialized expression from the (small, literal) pattern
  * list — model-sized work, like the PQ LUT reference objects. */
case class AcMatchesInline(child: Expression, patterns: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_ac_matches"

  @transient private lazy val ac = new AcAutomaton(patterns)

  override def nullSafeEval(input: Any): Any =
    AcOps.acScan(ac, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acInline", ac,
      "org.apache.spark.sql.graft.AcAutomaton")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.AcOps.acScan($acRef, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): AcMatchesInline =
    copy(child = newChild)
}

/** Distinct matched pattern ids (ascending `array<int>`) of a broadcast
  * [[AcAutomaton]] against a text column. Codegen'd: the generated code
  * resolves the broadcast once per task into a mutable state slot and
  * calls the scan kernel directly on the UTF8String value. */
case class AcMatches(child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[AcAutomaton])
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_ac_matches"

  override def nullSafeEval(input: Any): Any =
    AcOps.acScan(bc.value, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("acBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    val ac = ctx.addMutableState("org.apache.spark.sql.graft.AcAutomaton",
      "graftAc",
      v => s"$v = (org.apache.spark.sql.graft.AcAutomaton) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.AcOps.acScan($ac, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): AcMatches =
    copy(child = newChild)
}
