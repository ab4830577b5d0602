package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck equivalence for the gold-layer set/graph operators:
  * random keyed changesets and random baskets checked against
  * brute-force driver references. The triangle reference enumerates
  * ordered triples directly from the derived edge set, so any
  * orientation slip (double count, missed closing edge, dropped
  * duplicate) falsifies immediately.
  */
object GoldProps extends Properties("Gold") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  private val genBase = Gen.mapOf(for {
    k <- Gen.choose(1L, 8L)
    n <- Gen.choose(1L, 5L)
    cents <- Gen.choose(0L, 5000L)
  } yield k -> (n, cents))

  private val genChanges = Gen.mapOf(for {
    k <- Gen.choose(1L, 8L)
    n <- Gen.choose(1L, 5L)
    cents <- Gen.choose(0L, 5000L)
    op <- Gen.oneOf("U", "D")
  } yield k -> (n, cents, op))

  property("mergeUpsert equals the four-branch reference merge") =
    Prop.forAll(genBase, genChanges) { (base, chg) =>
      import spark.implicits._
      val baseDf = base.toSeq.map { case (k, (n, c)) => (k, n, c) }
        .toDF("o_custkey", "n_orders", "cents")
      val chgDf = chg.toSeq.map { case (k, (n, c, op)) => (k, n, c, op) }
        .toDF("o_custkey", "c_n", "c_cents", "op")
      val expected = (base.keySet ++ chg.keySet).toSeq.sorted.flatMap { k =>
        (base.get(k), chg.get(k)) match {
          case (Some((n, c)), None)                => Some((k, n, c))
          case (Some(_), Some((_, _, "D")))        => None // matched delete
          case (Some((n, c)), Some((cn, cc, _)))   => Some((k, n + cn, c + cc))
          case (None, Some((cn, cc, "U")))         => Some((k, cn, cc))
          case (None, Some((_, _, _)))             => None // unmatched delete
        }
      }
      // compare in exact cents: the engine divides once on output, so
      // round-tripping its 2dp double back to cents is lossless
      val got = Gold.mergeUpsert(baseDf, chgDf).collect().map(r =>
        (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100))).toSeq
      got == expected
    }

  private val genBaskets = for {
    n <- Gen.choose(1, 20)
    rows <- Gen.listOfN(n, for {
      order <- Gen.choose(1L, 5L)
      part <- Gen.choose(1L, 7L)
    } yield (order, part))
  } yield rows

  property("copurchaseTriangles equals brute-force triple enumeration") =
    Prop.forAll(genBaskets) { rows =>
      import spark.implicits._
      val li = rows.toDF("l_orderkey", "l_partkey")
      // reference: undirected edge set from per-order pairs, then count
      // triples {a<b<c} with all three edges present; per-node = number
      // of triples containing the node
      val byOrder = rows.distinct.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
      val edges = byOrder.values.flatMap(ps =>
        for (a <- ps; b <- ps if a < b) yield (a, b)).toSet
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val triples = for {
        a <- nodes; b <- nodes if a < b && edges((a, b))
        c <- nodes if b < c && edges((b, c)) && edges((a, c))
      } yield (a, b, c)
      val perNode = triples.flatMap(t => Seq(t._1, t._2, t._3))
        .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      val expected = perNode.toSeq.sortBy { case (k, n) => (-n, k) }.take(20)
      val got = Gold.copurchaseTriangles(li).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSeq
      got == expected
    }
}
