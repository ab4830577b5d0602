package graft

import org.apache.spark.sql.functions._

/** Connected components (large-star/small-star) vs a driver-side
  * union-find ground truth, plus the worst-case shapes for each
  * algorithm family (long chains kill label propagation; stars kill
  * naive pair-joins). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Ground truth: union-find over the same edges. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses to its minimum (label-prop worst case)") {
    val edges = (1L until 64L).map(i => (i, i + 1))
    val got = cc(edges)
    assert(got.keySet == (1L to 64L).toSet)
    assert(got.values.toSet == Set(1L))
  }

  test("disjoint cliques and a star keep separate labels") {
    val clique = for { a <- 10L to 14L; b <- 10L to 14L if a < b } yield (a, b)
    val star = (101L to 110L).map(v => (100L, v))
    val got = cc(clique ++ star ++ Seq((500L, 501L)))
    assert(got.filter(_._1 >= 10L).filter(_._1 <= 14L).values.toSet == Set(10L))
    assert(got.filter(_._1 >= 100L).filter(_._1 <= 110L).values.toSet == Set(100L))
    assert(got(501L) == 500L && got(500L) == 500L)
  }

  test("seeded random graph matches union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val truth = unionFind(edges)
    assert(cc(edges) == truth)
  }

  test("empty and self-loop-only edge sets yield no components") {
    assert(cc(Seq.empty) == Map.empty)
    assert(cc(Seq((7L, 7L))) == Map.empty)
  }

  test("star edge set is a fixpoint of both phases") {
    val star = (2L to 9L).map(v => (v, 1L)).toDF("a", "b")
    val afterLarge = Graph.largeStar(star).orderBy("a")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val afterSmall = Graph.smallStar(star).orderBy("a")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = (2L to 9L).map(v => (v, 1L))
    assert(afterLarge == want)
    assert(afterSmall == want)
  }

  test("dedupClusters: every doc labeled, representatives are members, sizes consistent") {
    val docs = Tables.documents(spark, sf)
    val out = Llm.dedupClusters(docs).cache()
    assert(out.count() == docs.count())
    // cluster_id is always a member of its own cluster
    assert(out.filter(col("doc_id") === col("cluster_id")).count() ==
      out.select("cluster_id").distinct().count())
    // sizes sum back to the doc count
    val sizeSum = out.filter(col("doc_id") === col("cluster_id"))
      .agg(sum("cluster_size")).head().getLong(0)
    assert(sizeSum == docs.count())
    out.unpersist()
  }
}
