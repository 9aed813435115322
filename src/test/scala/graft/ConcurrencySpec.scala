package graft

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Thread-safety of the query path: a shared SparkSession serving many
  * concurrent `Graft.query` calls is the normal deployment shape (a
  * notebook gateway, a query service), and the engine's only per-query
  * mutable state is ThreadLocal (PlanBuilder's two-pass-NR buffer) or
  * instance-scoped (ExprTranslator). This pins that — distinct queries
  * planned and executed from many threads at once neither cross wires
  * (wrong results) nor throw. */
class ConcurrencySpec extends SparkSpec {
  import spark.implicits._

  test("parallel Graft.query calls on one session stay isolated") {
    val df = (1 to 300).map(i => (i.toLong, s"name_$i", i % 7))
      .toDF("id", "name", "grp")
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // 24 tasks over 8 threads, 4 distinct query shapes with
      // shape-specific expected answers
      val futures = (0 until 24).map { i =>
        Future {
          i % 4 match {
            case 0 =>
              val out = Graft.query(spark,
                s"SELECT a.id, a.name WHERE a.grp == ${i % 7}", df).collect()
              assert(out.nonEmpty && out.forall(_.getString(1)
                .startsWith("name_")), s"task $i")
              out.length
            case 1 =>
              val out = Graft.query(spark,
                "SELECT a.grp, COUNT(*) AS n GROUP BY a.grp", df).collect()
              assert(out.length == 7, s"task $i: ${out.length} groups")
              out.map(_.getLong(1)).sum.toInt
            case 2 =>
              val out = Graft.query(spark,
                "SELECT TOP 5 a.id ORDER BY a.id DESC", df).collect()
              assert(out.map(_.getLong(0)).toSeq ==
                Seq(300L, 299L, 298L, 297L, 296L), s"task $i")
              out.length
            case _ =>
              val out = Graft.query(spark,
                "SELECT NR, a.id WHERE NR <= 10", df, ordered = true)
                .collect()
              assert(out.length == 10 &&
                out.map(_.getLong(0)).toSeq == (1L to 10L), s"task $i")
              out.length
          }
        }
      }
      val results = Await.result(Future.sequence(futures), 300.seconds)
      // group-by tasks must each see all 300 rows
      assert(results.zipWithIndex.collect {
        case (n, i) if i % 4 == 1 => n }.forall(_ == 300))
    } finally pool.shutdown()
  }
}
