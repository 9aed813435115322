package graft

import graft.pipeline.Bucketing

/** The co-located-join contract: both sides bucketed on the join key →
  * the join plans with ZERO exchanges (the shuffle happened once, at
  * write time). This is the 100 TB answer for recurring large joins. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without any exchange") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    Bucketing.writeBucketed(orders, "graft_b_orders", "o_custkey", 8)
    Bucketing.writeBucketed(customer, "graft_b_customer", "c_custkey", 8)
    try {
      // at sf0.001 Spark would just broadcast the tiny dimension (and
      // skip bucketed scans); disable broadcast to plan the shape the
      // bucketing exists for — the 100-TB-sized join
      val big = spark.newSession()
      big.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(big,
        "graft_b_orders", "graft_b_customer", "o_custkey", "c_custkey")
      // row-correct vs the plain join
      val expected = orders.join(customer,
        orders("o_custkey") === customer("c_custkey")).count()
      assert(joined.count() == expected)
      val plan = joined.queryExecution.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      assert(exchanges == 0, s"expected a shuffle-free bucketed join:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a bucket-aligned join:\n$plan")
      // sorted buckets also remove the join-time sort of the scan side
      assert("Sort \\[".r.findAllIn(plan).isEmpty ||
        plan.contains("SortMergeJoin"), plan)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_customer")
    }
  }
}
