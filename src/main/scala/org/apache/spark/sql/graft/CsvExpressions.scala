package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Primitive kernel for the RFC quote-aware CSV field split. Top-level
  * object ⇒ Java static forwarder, so generated code calls
  * `GraftCsvOps.rfcSplit(...)` directly. */
object GraftCsvOps {
  def rfcSplit(line: UTF8String, delim: String): ArrayData = {
    val fields = graft.sources.RfcSplit.splitQuoted(line.toString, delim)
    val out = new Array[Any](fields.length)
    var i = 0
    while (i < fields.length) {
      out(i) = UTF8String.fromString(fields(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  def rfcCount(line: UTF8String, delim: String): Int =
    graft.sources.RfcSplit.countFields(line.toString, delim)

  def pyFloatRepr(x: Double): UTF8String =
    UTF8String.fromString(graft.sinks.PyFloat.repr(x))
}

/** Quote-aware CSV record split (the reference's split_quoted_str
  * semantics, [[graft.sources.RfcSplit]]) as a native expression: the
  * last two Scala `udf`s in the engine lived on the whitespace/multichar/
  * comment-regex CSV text policies and broke whole-stage codegen there
  * (round-9 verdict #4). doGenCode emits a direct static call on the
  * already-generated child value — the text path stays in one codegen
  * span. Input: string; output: array<string> (non-null elements), so
  * `size(...)` composes for the NF-only call site. */
case class RfcSplitFields(child: Expression, delim: String)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_rfc_split"

  override def nullSafeEval(input: Any): Any =
    GraftCsvOps.rfcSplit(input.asInstanceOf[UTF8String], delim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the delimiter travels as a reference object — a quote or backslash
    // inside a multichar delimiter must not be spliced into source text
    val d = ctx.addReferenceObj("delim", delim, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.GraftCsvOps.rfcSplit($c, $d);")
  }

  override protected def withNewChildInternal(newChild: Expression): RfcSplitFields =
    copy(child = newChild)
}

/** Field COUNT of one record ([[graft.sources.RfcSplit.countFields]]) —
  * zero per-field allocation, for the width-inference pass and the NF
  * warning scan where `size(rfc_split(...))` would materialize and discard
  * every field array. */
case class RfcFieldCount(child: Expression, delim: String)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = IntegerType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_rfc_count"

  override def nullSafeEval(input: Any): Any =
    GraftCsvOps.rfcCount(input.asInstanceOf[UTF8String], delim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = ctx.addReferenceObj("delim", delim, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.GraftCsvOps.rfcCount($c, $d);")
  }

  override protected def withNewChildInternal(newChild: Expression): RfcFieldCount =
    copy(child = newChild)
}

/** Python `str(float)` rendering ([[graft.sinks.PyFloat]]) as a native
  * codegen'd expression — the CSV sink's float-output normalization
  * (reference normalize_fields is `str(value)`, rbql_csv.py:258-277). */
case class PyFloatRepr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StringType
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_py_float_repr"

  override def nullSafeEval(input: Any): Any =
    GraftCsvOps.pyFloatRepr(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.GraftCsvOps.pyFloatRepr($c);")

  override protected def withNewChildInternal(newChild: Expression): PyFloatRepr =
    copy(child = newChild)
}

object csvtext {
  import org.apache.spark.sql.classic.ExpressionUtils.{column, expression}
  def rfc_split(c: Column, delim: String): Column =
    column(RfcSplitFields(expression(c), delim))
  def rfc_count(c: Column, delim: String): Column =
    column(RfcFieldCount(expression(c), delim))
  def py_float_repr(c: Column): Column =
    column(PyFloatRepr(expression(c)))
}
