package graft.engine

/** Error taxonomy mirroring the reference's three user-facing categories
  * (query parsing / query execution / IO) — see
  * /root/reference/rbql-py/rbql/rbql_engine.py:53-60 and the mapping in
  * exception_to_error_info (rbql_engine.py:950-975).
  */
sealed abstract class GraftError(val category: String, msg: String)
    extends RuntimeException(msg)

/** Syntactic / semantic query errors detected before execution. */
final class ParsingError(msg: String) extends GraftError("query parsing", msg)

/** Errors raised while the query runs (bad coercion, cardinality guards…). */
final class QueryRuntimeError(msg: String)
    extends GraftError("query execution", msg)

/** Source / sink / table-resolution failures. */
final class IoError(msg: String) extends GraftError("IO handling", msg)

object Errors {
  def parsing(msg: String): Nothing = throw new ParsingError(msg)
  def runtime(msg: String): Nothing = throw new QueryRuntimeError(msg)
  def io(msg: String): Nothing = throw new IoError(msg)

  /** Targeted hints for common SQL-isms the dialect doesn't support,
    * mirroring rbql_engine.py:959-966 (HAVING / LIKE-operator / sql SELECT).
    */
  def hintFor(query: String): Option[String] = {
    val q = query.toLowerCase(java.util.Locale.ROOT)
    if (q.contains("having"))
      Some("HAVING is not supported; use a pipe: ... | SELECT * WHERE <cond>")
    else None
  }
}

/** Non-fatal warnings accumulated during a query (ragged input, null in
  * output, …) — reference: rbql_csv.py:309-315,496-504. */
final class WarningSink {
  private val buf = scala.collection.mutable.LinkedHashSet.empty[String]
  def add(w: String): Unit = synchronized { buf += w }
  def all: Seq[String] = synchronized { buf.toSeq }
}
