package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-style non-fatal warnings (rbql_csv.py:309-315, 496-504):
  * nulls replaced in output, output fields containing the delimiter.
  * Computed in ONE aggregate pass over the result (no per-row driver
  * work); call before/with a sink write. */
object Warnings {

  def scan(df: DataFrame, delim: String = ","): Seq[String] = {
    val strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name)
    val nullChecks = df.schema.fieldNames.map(c =>
      sum(when(col(s"`$c`").isNull, 1).otherwise(0)).alias(s"__n_$c"))
    val delimChecks = strCols.map(c =>
      sum(when(col(s"`$c`").contains(delim), 1).otherwise(0)).alias(s"__d_$c"))
    if (nullChecks.isEmpty) return Seq.empty
    val row = df.agg(nullChecks.head, (nullChecks.tail ++ delimChecks).toIndexedSeq: _*).head()
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    val nNull = df.schema.fieldNames.indices
      .map(i => if (row.isNullAt(i)) 0L else row.getLong(i)).sum
    if (nNull > 0)
      buf += s"null values in $nNull output field(s) were written as empty strings"
    val offset = df.schema.fieldNames.length
    val nDelim = strCols.indices
      .map(i => if (row.isNullAt(offset + i)) 0L else row.getLong(offset + i)).sum
    if (nDelim > 0)
      buf += s"$nDelim output field(s) contain the separator and were quoted"
    buf.toSeq
  }
}
