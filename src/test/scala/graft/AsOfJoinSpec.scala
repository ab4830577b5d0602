package graft

import org.apache.spark.sql.functions._

/** The custom as-of operator (AsOfJoinNode / AsOfJoinStrategy /
  * AsOfJoinExec) must match the composed window formulation row-for-row
  * and plan as a sort-merge: exchanges and sorts inserted by
  * EnsureRequirements, one AsOfJoinExec, no nested loop. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of semantics on literal frames: inclusive match, tie-break, no-match null") {
    val events = Seq(
      (100L, 1L, "2024-01-10 12:00:00"), // after both orders of key 1
      (101L, 1L, "2024-01-05 00:00:00"), // exactly at order B's ts: inclusive
      (102L, 1L, "2024-01-01 00:00:00"), // before every order: null
      (103L, 2L, "2024-06-01 00:00:00"), // key with no orders at all: null
      (104L, 3L, "2024-03-01 00:00:00")) // two orders at SAME ts: max rid wins
      .map { case (e, u, t) => (e, u, ts(t)) }.toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (10L, 1L, "2024-01-03 00:00:00", 30.0),
      (11L, 1L, "2024-01-05 00:00:00", 50.0),
      (20L, 3L, "2024-02-01 00:00:00", 70.0),
      (21L, 3L, "2024-02-01 00:00:00", 90.0)) // same ts as rid 20, larger rid
      .map { case (o, c, t, p) => (o, c, ts(t), p) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")

    val out = graft.plans.AsOf.joinAsOf(events, orders,
      "user_id", "o_custkey", "ts", "o_orderdate",
      payload = Seq("o_totalprice"), rightTie = Seq("o_orderkey"))
      .orderBy("event_id")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(3)) null else r.getAs[Double]("o_totalprice"))).toMap

    assert(out == Map(100L -> 50.0, 101L -> 50.0, 102L -> null,
      103L -> null, 104L -> 90.0))
  }

  test("tolerance: matches staler than the bound yield null, within-bound unchanged") {
    val events = Seq(
      (200L, 1L, "2024-01-10 12:00:00"), // 5.5 days after order 11: within 7d
      (201L, 1L, "2024-01-20 00:00:00"), // 15 days after order 11: too stale
      (202L, 1L, "2024-01-05 00:00:00")) // exact-ts match: staleness 0
      .map { case (e, u, t) => (e, u, ts(t)) }.toDF("event_id", "user_id", "ts")
    val orders = Seq(
      (10L, 1L, "2024-01-03 00:00:00", 30.0),
      (11L, 1L, "2024-01-05 00:00:00", 50.0))
      .map { case (o, c, t, p) => (o, c, ts(t), p) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = graft.plans.AsOf.joinAsOf(events, orders,
      "user_id", "o_custkey", "ts", "o_orderdate",
      payload = Seq("o_totalprice"), rightTie = Seq("o_orderkey"),
      tolerance = Some(7L * 86400 * 1000000L)) // 7 days in µs
      .orderBy("event_id").collect()
      .map(r => r.getAs[Long]("event_id") ->
        (if (r.isNullAt(3)) null else r.getAs[Double]("o_totalprice"))).toMap
    assert(out == Map(200L -> 50.0, 201L -> null, 202L -> 50.0))
  }

  test("custom plan matches the composed window formulation on the real tables") {
    val events = Tables.events(spark, sf)
    val orders = Tables.orders(spark, sf)
    val composed = Serving.eventsAsofOrderPrice(events, orders).collect()
    val custom = graft.plans.AsOf.joinAsOf(
      events.select(col("event_id"), col("user_id"), col("ts")), orders,
      "user_id", "o_custkey", "ts", "o_orderdate",
      payload = Seq("o_totalprice"), rightTie = Seq("o_orderkey"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("o_totalprice").as("last_order_price"))
      .orderBy("event_id")
      .collect()
    assert(custom.length == composed.length)
    assert(custom.map(_.mkString("|")).toSeq == composed.map(_.mkString("|")).toSeq)
  }

  test("planner: AsOfJoinExec with EnsureRequirements-inserted exchanges and sorts") {
    val events = Tables.events(spark, sf)
    val orders = Tables.orders(spark, sf)
    val df = graft.plans.AsOf.joinAsOf(
      events.select(col("event_id"), col("user_id"), col("ts")), orders,
      "user_id", "o_custkey", "ts", "o_orderdate",
      payload = Seq("o_totalprice"), rightTie = Seq("o_orderkey"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    // the operator declares distribution+ordering; Catalyst inserts the
    // rest — co-partitioning exchanges and (key, ts) sorts
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort ["), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // pruned right side: only key/ts/tie/payload columns reach the exchange
    assert(!plan.contains("o_comment"), plan)
  }

  test("optimizer rule pushes left-only filters below the as-of node into the scan") {
    val events = Tables.events(spark, sf)
    val orders = Tables.orders(spark, sf)
    def asof = graft.plans.AsOf.joinAsOf(
      events.select(col("event_id"), col("user_id"), col("ts")), orders,
      "user_id", "o_custkey", "ts", "o_orderdate",
      payload = Seq("o_totalprice"), rightTie = Seq("o_orderkey"))
    val filtered = asof.filter(col("user_id") === 7L)
    val plan = filtered.queryExecution.executedPlan.toString
    // the predicate must reach the events parquet scan, not sit above the join
    assert(plan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]"), plan)
    // a payload predicate must NOT be pushed (it needs the join's result)
    val mixed = asof.filter(col("user_id") === 7L && col("o_totalprice") > 50.0)
    val mixedPlan = mixed.queryExecution.optimizedPlan.toString
    assert(mixedPlan.contains("AsOfJoinNode") || mixedPlan.contains("as-of") ||
      mixedPlan.contains("AsOfJoin"), mixedPlan)
    // and results agree with filtering the unoptimized-shape output
    val expect = asof.collect().filter(r => r.getLong(1) == 7L)
    val got = filtered.collect()
    assert(got.map(_.mkString("|")).sorted.toSeq ==
      expect.map(_.mkString("|")).sorted.toSeq)
  }
}
