package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import EntryHelpers._

/** RBQL-surface (reference §2 rows 14-43) contract queries + their DuckDB oracles, kept ADJACENT per
  * family (split from the former 5k-line SparkEntry maps — round-9
  * verdict #7: a mis-paired oracle edit was a 5k-line scroll).
  * [[SparkEntry]] aggregates every family and asserts name uniqueness. */
private[graft] object RbqlEntries {

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // §2.3 projection + §2.4 WHERE + §2.7 ORDER BY
    "q_select_where" -> ((s, dir) => Graft.query(s,
      "SELECT a.l_orderkey, a.l_linenumber, a.l_quantity, a.l_extendedprice " +
        "WHERE a.l_quantity > 45 ORDER BY a.l_orderkey, a.l_linenumber",
      t(s, dir, "lineitem"))),
    // §2.7 TOP with multi-key mixed-direction sort
    "q_top" -> ((s, dir) => Graft.query(s,
      "SELECT TOP 100 a.l_orderkey, a.l_linenumber, a.l_extendedprice " +
        "ORDER BY a.l_extendedprice DESC, a.l_orderkey, a.l_linenumber",
      t(s, dir, "lineitem"))),
    // §2.6 GROUP BY + COUNT/SUM/MIN/MAX/AVG (output sorted by group key)
    "q_agg_group" -> ((s, dir) => Graft.query(s,
      "SELECT a.l_returnflag, a.l_linestatus, COUNT(*) AS cnt, " +
        "SUM(a.l_quantity) AS sum_qty, MIN(a.l_extendedprice) AS min_price, " +
        "MAX(a.l_extendedprice) AS max_price, AVG(a.l_discount) AS avg_disc " +
        "GROUP BY a.l_returnflag, a.l_linestatus",
      t(s, dir, "lineitem"))
      .withColumn("avg_disc", pipeline.Rounding.halfUp(col("avg_disc"), 6))),
    // §2.6 global aggregation (no GROUP BY)
    "q_agg_global" -> ((s, dir) => Graft.query(s,
      "SELECT COUNT(*) AS n_rows, MAX(a.o_totalprice) AS max_price, " +
        "MIN(a.o_custkey) AS min_cust",
      t(s, dir, "orders"))),
    // §2.6 MEDIAN (exact) + VARIANCE (population)
    "q_median_var" -> ((s, dir) => Graft.query(s,
      "SELECT a.l_returnflag, MEDIAN(a.l_quantity) AS med_qty, " +
        "VARIANCE(a.l_discount) AS var_disc GROUP BY a.l_returnflag",
      t(s, dir, "lineitem"))
      .withColumn("var_disc", pipeline.Rounding.halfUp(col("var_disc"), 8))),
    // §2.6 ANY_VALUE (deterministic: single-row groups)
    "q_any_value" -> ((s, dir) => Graft.query(s,
      "SELECT a.n_nationkey, ANY_VALUE(a.n_name) AS name GROUP BY a.n_nationkey",
      t(s, dir, "nation"))),
    // §2.6 ANY_VALUE with multi-row groups: first-seen value in record
    // order (min_by NR — rbql_engine.py:317-325)
    "q_any_value_multi" -> ((s, dir) => Graft.query(s,
      "SELECT a.l_returnflag, ANY_VALUE(a.l_orderkey) AS first_key " +
        "GROUP BY a.l_returnflag",
      t(s, dir, "lineitem"))),
    // §2.6 ARRAY_AGG — insertion (NR) order, emitted as a joined string
    // (the oracle harness cannot hash list columns)
    "q_array_agg" -> ((s, dir) => Graft.query(s,
      "SELECT a.n_regionkey, ARRAY_AGG(a.n_name) AS names GROUP BY a.n_regionkey",
      t(s, dir, "nation"))
      .withColumn("names", array_join(col("names"), "|"))),
    // §2.6 ARRAY_AGG with post-processing lambda (README.md:91-92)
    "q_array_agg_cb" -> ((s, dir) => Graft.query(s,
      "SELECT a.n_regionkey, ARRAY_AGG(a.n_name, v -> slice(v, 1, 3)) AS top3 " +
        "GROUP BY a.n_regionkey",
      t(s, dir, "nation"))
      .withColumn("top3", array_join(col("top3"), "|"))),
    // §2.6 aggregate int-preservation: sum/min/max of int-strings come
    // back integral (NumHandler, rbql_engine.py:293-314)
    "q_sum_int" -> ((s, dir) => Graft.query(s,
      "SELECT a.l_returnflag, SUM(a.ln_s) AS s_ln, MIN(a.ln_s) AS min_ln, " +
        "MAX(a.ln_s) AS max_ln GROUP BY a.l_returnflag",
      t(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_linenumber").cast("string").alias("ln_s")))),
    // §2.5 inner JOIN
    "q_join_inner" -> ((s, dir) => Graft.query(s,
      "SELECT a.s_suppkey, a.s_name, b.n_name JOIN nation " +
        "ON a.s_nationkey == b.n_nationkey ORDER BY a.s_suppkey",
      t(s, dir, "supplier"), all(s, dir))),
    // §2.5 LEFT JOIN (unmatched A rows null-padded)
    "q_join_left" -> ((s, dir) => Graft.query(s,
      "SELECT a.c_custkey, b.o_orderkey LEFT JOIN orders " +
        "ON a.c_custkey == b.o_custkey ORDER BY a.c_custkey, b.o_orderkey",
      t(s, dir, "customer"), all(s, dir))),
    // §2.5 STRICT LEFT JOIN (cardinality-checked; every supplier has
    // exactly one nation)
    "q_strict_left" -> ((s, dir) => Graft.query(s,
      "SELECT a.s_suppkey, b.n_name STRICT LEFT JOIN nation " +
        "ON a.s_nationkey == b.n_nationkey ORDER BY a.s_suppkey",
      t(s, dir, "supplier"), all(s, dir))),
    // §2.3 UPDATE (projection-as-mutation; all rows emitted, input order)
    "q_update" -> ((s, dir) => Graft.query(s,
      "UPDATE a.p_retailprice = a.p_retailprice * 1.1 WHERE a.p_size > 30",
      t(s, dir, "part"))),
    // §2.3 SELECT EXCEPT (column exclusion)
    "q_except" -> ((s, dir) => Graft.query(s,
      "SELECT EXCEPT a.o_orderdate, a.o_orderpriority ORDER BY o_orderkey",
      t(s, dir, "orders"))),
    // §2.7 SELECT DISTINCT
    "q_distinct" -> ((s, dir) => Graft.query(s,
      "SELECT DISTINCT a.l_returnflag, a.l_linestatus " +
        "ORDER BY l_returnflag, l_linestatus",
      t(s, dir, "lineitem"))),
    // §2.7 SELECT DISTINCT COUNT (occurrence count prepended)
    "q_distinct_count" -> ((s, dir) => Graft.query(s,
      "SELECT DISTINCT COUNT a.o_orderpriority ORDER BY o_orderpriority",
      t(s, dir, "orders"))),
    // §2.8 UNNEST (lateral explode) + pipe for deterministic order
    "q_unnest" -> ((s, dir) => Graft.query(s,
      "SELECT a.p_partkey, UNNEST(split(a.p_type, ' ')) AS word " +
        "WHERE a.p_partkey <= 200 | SELECT a.p_partkey, a.word " +
        "ORDER BY a.p_partkey, a.word",
      t(s, dir, "part"))),
    // §2.8 pipe chaining (filter stage | aggregate stage)
    "q_pipe" -> ((s, dir) => Graft.query(s,
      "SELECT a.l_returnflag, a.l_quantity WHERE a.l_quantity > 30 " +
        "| SELECT a.l_returnflag, COUNT(*) AS cnt GROUP BY a.l_returnflag",
      t(s, dir, "lineitem"))),
    // NR over a SHUFFLE-FED pipe stage (agg output): the engine persists
    // the stage input so both NR passes read identical blocks
    // (PlanBuilder.withNr). The stage's row ORDER is partition-layout
    // defined, so the contract asserts the order-insensitive invariant:
    // NR is exactly the permutation 1..n (sum, min, max) — which is what
    // the persist exists to guarantee. Also the ×10 probe for "does the
    // stage persist dominate at scale" (BENCH scale10x entry).
    // groups by l_orderkey, NOT l_partkey: the ×10 replicas stride
    // orderkey, so the persisted stage input actually grows ×10 with
    // the data (partkey groups would stay constant and the probe would
    // measure nothing)
    "q_pipe_nr" -> ((s, dir) => Graft.query(s,
      "SELECT a.l_orderkey, SUM(a.l_quantity) AS qty GROUP BY a.l_orderkey " +
        "| SELECT COUNT(*) AS n_rows, SUM(NR) AS nr_sum, " +
        "MIN(NR) AS nr_min, MAX(NR) AS nr_max",
      t(s, dir, "lineitem"))),
    // §2.4 LIKE (suffix wildcard; '%ARD' matches STANDARD — non-empty)
    "q_like" -> ((s, dir) => Graft.query(s,
      "SELECT a.p_partkey, a.p_type WHERE a.p_type LIKE '%ARD' " +
        "ORDER BY a.p_partkey",
      t(s, dir, "part"))),
    // host-language expressions: scalar functions + CASE
    "q_scalar_case" -> ((s, dir) => Graft.query(s,
      "SELECT a.o_orderkey, upper(a.o_orderstatus) AS status_u, " +
        "CASE WHEN a.o_totalprice > 200000 THEN 'big' " +
        "WHEN a.o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket " +
        "ORDER BY a.o_orderkey",
      t(s, dir, "orders"))),
    // §1.1 NR record-number variable (assigned in file order, pre-shuffle)
    "q_nr" -> ((s, dir) => Graft.query(s,
      "SELECT NR AS rn, a.l_orderkey, a.l_linenumber WHERE NR <= 1000 ORDER BY NR",
      t(s, dir, "lineitem"))),
    // events table aggregation
    "q_events_agg" -> ((s, dir) => Graft.query(s,
      "SELECT a.event_type, COUNT(*) AS cnt, SUM(a.value) AS sv " +
        "GROUP BY a.event_type",
      t(s, dir, "events"))
      .withColumn("sv", pipeline.Rounding.halfUp(col("sv"), 4))),
    // JSON extraction from the events props column
    "q_json" -> ((s, dir) => Graft.query(s,
      "SELECT a.event_id, get_json_object(a.props, '$.k') AS k " +
        "WHERE a.event_id < 100 ORDER BY a.event_id",
      t(s, dir, "events"))),
  )

  val oracles: Seq[(String, String)] = Seq(
    "q_select_where" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem WHERE l_quantity > 45
         ORDER BY l_orderkey, l_linenumber""",
    "q_top" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""",
    "q_agg_group" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
         sum(l_quantity) AS sum_qty, min(l_extendedprice) AS min_price,
         max(l_extendedprice) AS max_price,
         floor((avg(l_discount)) * 1e6 + 0.5) / 1e6 AS avg_disc
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_agg_global" ->
      """SELECT count(*) AS n_rows, max(o_totalprice) AS max_price,
         min(o_custkey) AS min_cust FROM orders""",
    "q_median_var" ->
      """SELECT l_returnflag, median(l_quantity) AS med_qty,
         floor((var_pop(l_discount)) * 1e8 + 0.5) / 1e8 AS var_disc
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_any_value" ->
      """SELECT n_nationkey, min(n_name) AS name FROM nation
         GROUP BY n_nationkey ORDER BY n_nationkey""",
    "q_any_value_multi" ->
      """SELECT l_returnflag, arg_min(l_orderkey, rn) AS first_key FROM
         (SELECT l_returnflag, l_orderkey, row_number() OVER () AS rn
          FROM lineitem)
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_array_agg" ->
      """SELECT n_regionkey,
         array_to_string(list(n_name ORDER BY n_nationkey), '|') AS names
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "q_array_agg_cb" ->
      """SELECT n_regionkey,
         array_to_string((list(n_name ORDER BY n_nationkey))[1:3], '|') AS top3
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "q_sum_int" ->
      """SELECT l_returnflag, cast(sum(l_linenumber) AS varchar) AS s_ln,
         cast(min(l_linenumber) AS varchar) AS min_ln,
         cast(max(l_linenumber) AS varchar) AS max_ln
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_join_inner" ->
      """SELECT s_suppkey, s_name, n_name FROM supplier
         JOIN nation ON s_nationkey = n_nationkey ORDER BY s_suppkey""",
    "q_join_left" ->
      """SELECT c_custkey, o_orderkey FROM customer
         LEFT JOIN orders ON c_custkey = o_custkey
         ORDER BY c_custkey, o_orderkey NULLS FIRST""",
    "q_strict_left" ->
      """SELECT s_suppkey, n_name FROM supplier
         JOIN nation ON s_nationkey = n_nationkey ORDER BY s_suppkey""",
    "q_update" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size,
         CASE WHEN p_size > 30 THEN p_retailprice * 1.1
         ELSE p_retailprice END AS p_retailprice FROM part""",
    "q_except" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
         FROM orders ORDER BY o_orderkey""",
    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "q_distinct_count" ->
      """SELECT count(*) AS count, o_orderpriority FROM orders
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_unnest" ->
      """SELECT p_partkey, unnest(string_split(p_type, ' ')) AS word
         FROM part WHERE p_partkey <= 200 ORDER BY p_partkey, word""",
    "q_pipe" ->
      """SELECT l_returnflag, count(*) AS cnt FROM
         (SELECT l_returnflag, l_quantity FROM lineitem WHERE l_quantity > 30)
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_pipe_nr" ->
      """WITH s AS (SELECT l_orderkey, sum(l_quantity) AS qty
                    FROM lineitem GROUP BY l_orderkey)
         SELECT count(*)::BIGINT AS n_rows,
                (count(*) * (count(*) + 1) / 2)::BIGINT AS nr_sum,
                1::BIGINT AS nr_min,
                count(*)::BIGINT AS nr_max
         FROM s""",
    "q_like" ->
      """SELECT p_partkey, p_type FROM part WHERE p_type LIKE '%ARD'
         ORDER BY p_partkey""",
    "q_scalar_case" ->
      """SELECT o_orderkey, upper(o_orderstatus) AS status_u,
         CASE WHEN o_totalprice > 200000 THEN 'big'
         WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket
         FROM orders ORDER BY o_orderkey""",
    "q_nr" ->
      """SELECT rn, l_orderkey, l_linenumber FROM
         (SELECT row_number() OVER () AS rn, l_orderkey, l_linenumber
          FROM lineitem) WHERE rn <= 1000 ORDER BY rn""",
    "q_events_agg" ->
      """SELECT event_type, count(*) AS cnt, floor((sum(value)) * 1e4 + 0.5) / 1e4 AS sv
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_json" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k
         FROM events WHERE event_id < 100 ORDER BY event_id""",
  )
}
