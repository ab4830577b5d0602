package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck equivalence for the temporal event operators: random
  * event streams (shared timestamps, clicks exactly on window bounds,
  * users with one event type only) checked against brute-force driver
  * references. The time-bin range join's subtlety is the bin
  * quantization — the reference states the raw interval predicate, so
  * any bin-edge slip (wrong probe bin, double count, boundary
  * inclusion) falsifies immediately. */
object EventsProps extends Properties("Events") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(SparkSpec.fuzzN(6))

  private lazy val spark = SparkSpec.session

  // minutes offset from a base hour; small ranges force same-bin and
  // adjacent-bin collisions, exact-boundary deltas (60 min apart), ties
  private val genEvent = for {
    user <- Gen.choose(1L, 3L)
    kind <- Gen.oneOf("click", "purchase", "view")
    mins <- Gen.choose(0, 200)
    secs <- Gen.oneOf(0, 1, 59)
  } yield (user, kind, mins, secs)

  private val genEvents = for {
    n <- Gen.choose(1, 25)
    es <- Gen.listOfN(n, genEvent)
  } yield es.zipWithIndex.map { case ((u, k, m, s), i) =>
    (i.toLong, u, k, m * 60L + s)
  }

  private def ts(offsetSec: Long): Timestamp =
    Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
      .plusSeconds(offsetSec))

  private def toDf(es: Seq[(Long, Long, String, Long)]) = {
    import spark.implicits._
    es.map { case (id, u, k, off) => (id, u, k, ts(off)) }
      .toDF("event_id", "user_id", "event_type", "ts")
  }

  property("clicksBeforePurchase equals the brute-force interval join") =
    Prop.forAll(genEvents) { es =>
      val purchases = es.filter(_._3 == "purchase")
      val clicks = es.filter(_._3 == "click")
      val expected = purchases.map { case (id, u, _, pOff) =>
        id -> clicks.count { case (_, cu, _, cOff) =>
          cu == u && cOff >= pOff - 3600 && cOff < pOff
        }.toLong
      }.toMap
      val got = Serving.clicksBeforePurchase(toDf(es)).collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_clicks")).toMap
      got == expected
    }

  property("eventsHopping equals the per-event 4-window expansion") =
    Prop.forAll(genEvents) { es =>
      import org.apache.spark.sql.functions.{col, lit}
      val df = toDf(es).withColumn("value", lit(1.0))
      // reference: each event belongs to windows starting at its 15-min
      // floor minus 0..3 slides; count per start
      val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC)
      val expected = es.flatMap { case (_, _, _, off) =>
        val bucket = (base + off) / 900 * 900
        (0 to 3).map(i => bucket - i * 900L)
      }.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
      val got = Serving.eventsHopping(df).collect().map(r =>
        r.getAs[Timestamp]("w_start").getTime / 1000 ->
          r.getAs[Long]("n_events")).toMap
      got == expected
    }

  property("customerOverlap flag-aggregate equals driver set algebra (and the Intersect form)") =
    Prop.forAll(Gen.listOfN(12, for {
      cust <- Gen.choose(1L, 5L)
      year <- Gen.oneOf(1994, 1995, 1996)
      price <- Gen.oneOf(0.0, 10.0) // 0.0 = invalid, must be excluded
    } yield (cust, year, price))) { rows =>
      import spark.implicits._
      val orders = rows.zipWithIndex.map { case ((c, y, p), i) =>
        (i.toLong, c, "F", p, Timestamp.valueOf(s"$y-06-01 00:00:00"), "1-URGENT")
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      val a = rows.collect { case (c, 1994, p) if p > 0 => c }.toSet
      val b = rows.collect { case (c, 1995, p) if p > 0 => c }.toSet
      val expected = Seq((a & b).size.toLong, (a -- b).size.toLong, (b -- a).size.toLong)
      val fused = Gold.customerOverlap(orders, 1994, 1995).head()
      val sets = Gold.customerOverlapSets(orders, 1994, 1995).head()
      // both year-sets empty: the row must still come back, with NULL
      // jaccard (0/0) — the unguarded division THREW here under ANSI
      val jaccardOk =
        if (a.isEmpty && b.isEmpty) fused.isNullAt(3) && sets.isNullAt(3)
        else !fused.isNullAt(3) && !sets.isNullAt(3)
      fused.toSeq.take(3) == expected && sets.toSeq.take(3) == expected && jaccardOk
    }

  property("customerOverlap on an all-invalid frame returns one zero row with NULL jaccard, never throws") =
    Prop.secure {
      import spark.implicits._
      // every row invalid (price 0) => both year-sets empty => 0/0;
      // the deterministic pin of the ANSI divide-by-zero crash the
      // generator above hits with ~0.8% probability per sample
      val allInvalid = Seq(
        (1L, 1L, "F", 0.0, Timestamp.valueOf("1994-06-01 00:00:00"), "1-URGENT"),
        (2L, 2L, "F", 0.0, Timestamp.valueOf("1995-06-01 00:00:00"), "1-URGENT"))
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority")
      val r = Gold.customerOverlap(allInvalid, 1994, 1995).head()
      val s = Gold.customerOverlapSets(allInvalid, 1994, 1995).head()
      r.toSeq.take(3) == Seq(0L, 0L, 0L) && r.isNullAt(3) &&
        s.toSeq.take(3) == Seq(0L, 0L, 0L) && s.isNullAt(3)
    }

  property("userStateIntervals equals the driver-side run collapse") =
    Prop.forAll(genEvents) { es =>
      val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
        .toEpochSecond(java.time.ZoneOffset.UTC)
      // reference: per user, (ts, event_id)-sort, collapse equal-type
      // runs, chain valid_to from the next run's first ts
      val expected = es.groupBy(_._2).toSeq.flatMap { case (u, evs) =>
        val sorted = evs.sortBy(e => (e._4, e._1))
        val runs = sorted.foldLeft(Vector.empty[(String, Long, Long)]) {
          case (acc, (_, _, k, off)) =>
            if (acc.nonEmpty && acc.last._1 == k)
              acc.init :+ ((k, acc.last._2, acc.last._3 + 1))
            else acc :+ ((k, off, 1L))
        }
        runs.zipWithIndex.map { case ((state, from, n), i) =>
          (u, (i + 1).toLong, state, from,
            runs.lift(i + 1).map(_._2), n)
        }
      }.toSet
      val got = Serving.userStateIntervals(toDf(es)).collect().map { r =>
        (r.getAs[Long]("user_id"), r.getAs[Long]("state_seq"),
          r.getAs[String]("state"),
          r.getAs[Timestamp]("valid_from").getTime / 1000 - base,
          Option(r.getAs[Timestamp]("valid_to")).map(_.getTime / 1000 - base),
          r.getAs[Long]("n_events"))
      }.toSet
      got == expected
    }

  property("eventsRollingRange equals the per-day calendar look-back") =
    Prop.forAll(genEvents) { es =>
      import org.apache.spark.sql.functions.{col, lit}
      // stretch minutes into days so the 7-day frame actually windows
      val byDay = es.map { case (id, u, k, off) => (id, u, k, off / 10) }
      val df = toDf(byDay.map { case (id, u, k, d) => (id, u, k, d * 86400L) })
        .withColumn("value", lit(1.0))
      val daily = byDay.groupBy { case (_, _, k, d) => (k, d) }
        .map { case ((k, d), xs) => (k, d) -> xs.size.toLong }
      val expected = daily.map { case ((k, d), _) =>
        (k, d) -> daily.collect {
          case ((k2, d2), n2) if k2 == k && d2 >= d - 6 && d2 <= d => n2
        }.sum
      }
      val got = Serving.eventsRollingRange(df).collect().map { r =>
        (r.getAs[String]("event_type"),
          r.getAs[java.sql.Date]("d").toLocalDate.toEpochDay -
            java.time.LocalDate.of(2024, 1, 1).toEpochDay) ->
          r.getAs[Long]("roll_n")
      }.toMap
      got == expected
    }

  property("eventFunnel equals the brute-force strict-order walk") =
    Prop.forAll(genEvents) { es =>
      def firstAfter(u: Long, kind: String, after: Long): Option[Long] = {
        val cands = es.collect {
          case (_, eu, k, off) if eu == u && k == kind && off > after => off
        }
        if (cands.isEmpty) None else Some(cands.min)
      }
      val users = es.map(_._2).distinct
      val v = users.flatMap(u =>
        es.collect { case (_, eu, k, off) if eu == u && k == "view" => off }
          .minOption.map(u -> _)).toMap
      val c = v.flatMap { case (u, tv) => firstAfter(u, "click", tv).map(u -> _) }
      val p = c.flatMap { case (u, tc) => firstAfter(u, "purchase", tc).map(u -> _) }
      val r = Serving.eventFunnel(toDf(es)).head()
      if (v.isEmpty)
        r.getAs[Long]("n_view") == 0L
      else
        r.getAs[Long]("n_view") == v.size.toLong &&
          r.getAs[Long]("n_click") == c.size.toLong &&
          r.getAs[Long]("n_purchase") == p.size.toLong
    }
}
