package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join must plan without a shuffle exchange. */
class BucketingSpec extends SparkSpec {

  test("bucketed join of orders x lineitem has no shuffle exchange") {
    // disable auto-broadcast so the join would otherwise be a
    // shuffle-exchange sort-merge join
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.cooLocatedOrderLines(spark, sf)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected exchange-free bucketed join, got:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      val expected = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
  }
}
