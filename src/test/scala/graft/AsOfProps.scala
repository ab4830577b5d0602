package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck equivalence: on random key/timestamp layouts (duplicate
  * timestamps, keys with no matches, events before any order), the custom
  * sort-merge as-of operator must select exactly what the composed
  * union + last(ignoreNulls) window formulation selects. */
object AsOfProps extends Properties("AsOfJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(SparkSpec.fuzzN(8))

  private lazy val spark = SparkSpec.session

  private def ts(day: Int): Timestamp =
    new Timestamp(java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
      .plusDays(day).toInstant(java.time.ZoneOffset.UTC).toEpochMilli)

  // small key and day spaces force collisions: same-ts orders (tie-break),
  // same-ts event+order (inclusive match), keys on one side only
  private val genEvent = for {
    key <- Gen.choose(1L, 6L)
    day <- Gen.choose(0, 15)
  } yield (key, day)
  private val genOrder = for {
    key <- Gen.choose(1L, 8L)
    day <- Gen.choose(0, 15)
    price <- Gen.choose(1, 999).map(_ / 10.0)
  } yield (key, day, price)

  property("custom operator == composed window formulation") =
    Prop.forAll(Gen.listOfN(30, genEvent), Gen.listOfN(25, genOrder)) { (evs, ords) =>
      import spark.implicits._
      val events = evs.zipWithIndex
        .map { case ((k, d), i) => (i.toLong, k, ts(d)) }
        .toDF("event_id", "user_id", "ts")
      val orders = ords.zipWithIndex
        .map { case ((k, d, p), i) => (i.toLong, k, ts(d), p) }
        .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val composed = Serving.eventsAsofOrderPrice(events, orders).collect()
      val custom = graft.plans.AsOf.joinAsOf(events, orders,
        "user_id", "o_custkey", "ts", "o_orderdate",
        payload = Seq("o_totalprice"), rightTie = Seq("o_orderkey"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("o_totalprice").as("last_order_price"))
        .orderBy("event_id")
        .collect()
      custom.map(_.mkString("|")).toSeq == composed.map(_.mkString("|")).toSeq
    }
}
