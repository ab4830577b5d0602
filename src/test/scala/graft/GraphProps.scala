package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck equivalence for the iterative graph operators: on random
  * undirected graphs (self-contained driver-side references, no Spark in
  * the oracle), the DataFrame frontier/contraction loops must produce
  * exactly the classical algorithms' answers. Fixed-case specs pin the
  * known edge semantics; these hunt the layouts nobody thought to write
  * down (stars inside chains, multi-component tangles, dense cores). */
object GraphProps extends Properties("Graph") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.session

  // up to 14 nodes over a 20-id space (gaps = isolated ids that must NOT
  // appear), edge count up to ~2n — sparse enough for long chains,
  // dense enough for cycles
  private val genGraph: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(2, 14)
    m <- Gen.choose(1, 2 * n)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(1L, 20L)
      b <- Gen.choose(1L, 20L) if a != b
    } yield (a, b))
  } yield edges

  private def refBfs(edges: Seq[(Long, Long)], source: Long): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    var dist = Map(source -> 0L)
    var frontier = Set(source)
    while (frontier.nonEmpty) {
      val next = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
      dist ++= next.map(_ -> (dist(frontier.head) + 1))
      frontier = next
    }
    dist
  }

  private def refComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> refBfs(edges, n).keySet.min).toMap
  }

  property("bfsDistances equals driver BFS on random graphs") =
    Prop.forAll(genGraph) { edges =>
      import spark.implicits._
      val df = (edges ++ edges.map(_.swap)).toDF("a", "b")
      val source = edges.head._1
      val got = Graph.bfsDistances(df, source, maxDepth = 25).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("dist")).toMap
      got == refBfs(edges, source)
    }

  property("connectedComponents labels every node with its component min") =
    Prop.forAll(genGraph) { edges =>
      import spark.implicits._
      val df = edges.toDF("a", "b")
      val got = Graph.connectedComponents(df).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("component")).toMap
      got == refComponents(edges)
    }
}
