package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Reference-replay fuzz for the quantile-histogram / drift family —
  * the operators whose driver-side `percentile(..., array(...))` folds
  * carried round-10's ArraySeq decode crash. Each property rebuilds the
  * FULL query result in independent driver-side Scala (Spark's exact
  * percentile interpolation `(hi−pos)·lo + (pos−lo)·hi`, the same
  * edge-comparison bucketing, the same HALF_UP rounding) and demands
  * exact equality on random cohorts: duplicate-heavy amounts (percentile
  * count-map and KS tie paths), boundary-landing values, single rows,
  * and empty baseline / comparison years (the degrade contracts).
  */
object DriftProps extends Properties("Drift") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(SparkSpec.fuzzN(8))

  private lazy val spark = SparkSpec.session

  private def round2(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(2, java.math.RoundingMode.HALF_UP)
      .doubleValue()
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Spark's exact Percentile: position p·(n−1) over the sorted multiset,
    * symmetric two-sided interpolation (NOT lo + frac·(hi−lo) — the
    * operand order matters at the last ulp). */
  private def refPercentile(sorted: IndexedSeq[Double], p: Double): Double = {
    val pos = p * (sorted.length - 1)
    val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
    // equal-key short-circuit mirrors Spark's Percentile exactly: inside a
    // duplicate run the weighted sum could drift an ulp off the raw value
    if (lo == hi || sorted(lo) == sorted(hi)) sorted(lo)
    else (hi - pos) * sorted(lo) + (pos - lo) * sorted(hi)
  }

  // --- cohort generator --------------------------------------------------

  /** Two-decimal money amounts drawn from a SMALL pool so duplicates and
    * edge-exact collisions are the common case, not the rare one. */
  private def genAmount(pool: IndexedSeq[Double]): Gen[Double] = Gen.oneOf(pool)
  private val genPool: Gen[IndexedSeq[Double]] = for {
    k <- Gen.choose(1, 8)
    vs <- Gen.listOfN(k, Gen.choose(100L, 99999L).map(_ / 100.0))
  } yield vs.toIndexedSeq

  private case class Order(key: Long, amount: Double, yr: Int)

  private def genOrders(years: Gen[Int]): Gen[List[Order]] = for {
    pool <- genPool
    n <- Gen.frequency(6 -> Gen.choose(1, 60), 1 -> Gen.const(0),
      1 -> Gen.const(1))
    rows <- Gen.listOfN(n, Gen.zip(genAmount(pool), years))
  } yield rows.zipWithIndex.map { case ((a, y), i) => Order(i.toLong, a, y) }

  private def ordersDf(rows: List[Order]) = {
    import spark.implicits._
    rows.map(o => (o.key, o.amount, java.sql.Date.valueOf(f"${o.yr}%04d-03-15")))
      .toDF("o_orderkey", "o_totalprice", "o_orderdate")
  }

  // --- distributionQuantile ------------------------------------------------

  property("distributionQuantile equals the percentile-edge replay") =
    Prop.forAll(genOrders(Gen.const(1996)), Gen.choose(2, 10)) { (rows, buckets) =>
      val got = Serving.distributionQuantile(ordersDf(rows), buckets)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
        .toSeq
      val want =
        if (rows.isEmpty) Seq.empty
        else {
          val sorted = rows.map(_.amount).sorted.toIndexedSeq
          val edges = (0 to buckets).map(b => refPercentile(sorted, b.toDouble / buckets))
          val interior = edges.slice(1, buckets)
          rows.groupBy(o => interior.count(o.amount >= _).toLong)
            .toSeq.sortBy(_._1)
            .map { case (b, os) =>
              (b, round2(edges(b.toInt)), round2(edges(b.toInt + 1)), os.size.toLong)
            }
        }
      Prop(got == want) :| s"n=${rows.size} buckets=$buckets got=$got want=$want"
    }

  // --- spendPsi -------------------------------------------------------------

  private val genYear: Gen[Int] =
    Gen.frequency(4 -> Gen.const(1996), 4 -> Gen.const(1997), 1 -> Gen.const(1998))

  property("spendPsi equals the decile-replay on hostile cohorts") =
    Prop.forAll(genOrders(genYear)) { rows =>
      val got = Serving.spendPsi(ordersDf(rows))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
        .toSeq
      val a = rows.filter(_.yr == 1996).map(_.amount)
      val b = rows.filter(_.yr == 1997).map(_.amount)
      val interior =
        if (a.isEmpty) IndexedSeq.empty[Double]
        else {
          val s = a.sorted.toIndexedSeq
          (1 until 10).map(k => refPercentile(s, k / 10.0))
        }
      def bucket(x: Double): Long = interior.count(x >= _).toLong
      val ca = a.groupBy(bucket).view.mapValues(_.size.toLong).toMap
      val cb = b.groupBy(bucket).view.mapValues(_.size.toLong).toMap
      val want = (ca.keySet ++ cb.keySet).toSeq.sorted.map { bk =>
        val (nA, nB) = (ca.getOrElse(bk, 0L), cb.getOrElse(bk, 0L))
        val term = if (nA > 0 && nB > 0) {
          val (pa, pb) = (nA / a.size.toDouble, nB / b.size.toDouble)
          Some(round6((pa - pb) * math.log(pa / pb)))
        } else None
        (bk, nA, nB, term)
      }
      Prop(got == want) :| s"a=${a.size} b=${b.size} got=$got want=$want"
    }

  // --- spendKs ----------------------------------------------------------------

  property("spendKs equals the integer-exact CDF-gap replay") =
    Prop.forAll(genOrders(genYear)) { rows =>
      val got = Serving.spendKs(ordersDf(rows))
        .collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.getDouble(0)),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getLong(2), r.getLong(3)))
        .toSeq
      val a = rows.filter(_.yr == 1996).map(_.amount)
      val b = rows.filter(_.yr == 1997).map(_.amount)
      val (na, nb) = (a.size.toLong, b.size.toLong)
      val want =
        if (na == 0L || nb == 0L) Seq((None, None, na, nb))
        else {
          val values = (a ++ b).distinct.sorted
          var (ca, cb) = (0L, 0L)
          val gaps = values.map { v =>
            ca += a.count(_ == v); cb += b.count(_ == v)
            (v, math.abs(ca * nb - cb * na))
          }
          // argmax with the smallest-amount tie-break the query sorts by
          val (v, g) = gaps.maxBy { case (v, g) => (g, -v) }
          Seq((Some(round6(g / (na.toDouble * nb))), Some(round2(v)), na, nb))
        }
      Prop(got == want) :| s"na=$na nb=$nb got=$got want=$want"
    }
}
