package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a DataFrame edge list, via
  * alternating large-star / small-star contraction (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014 — a public
  * algorithm designed exactly for this engine's target shape: huge edge
  * sets, bounded-memory reducers, no driver-side graph).
  *
  * Why not label propagation: naive min-label flooding needs
  * O(diameter) rounds — a pathological dup chain (doc A ~ B ~ C ~ ...)
  * makes it O(n). Star contraction converges in O(log² n) rounds on ANY
  * graph, each round being two groupBy shuffles that carry only 8-byte
  * node ids. That is the 100 TB-safe choice.
  *
  * Per-round mechanics (all DataFrame ops, nothing on the driver but the
  * convergence check):
  *  - large-star: every node attaches its LARGER neighbors to the
  *    minimum of its neighborhood (incl. itself) — long chains collapse
  *    toward small ids without ever growing a reducer's group beyond the
  *    node's degree.
  *  - small-star: every node attaches its smaller-or-equal neighbors
  *    (and itself) to the minimum — turns the forest into stars.
  *  - `localCheckpoint` truncates the plan each round (an iterative
  *    DataFrame loop otherwise accretes an exponentially growing
  *    lineage). On a real cluster with a fault-tolerance requirement,
  *    swap for `checkpoint` onto durable storage — same call shape.
  *
  * Convergence = the (count, hash-sum) checksum of the edge set is
  * unchanged by a full large+small round; at the fixpoint every edge is
  * (node, componentMin), i.e. the stars ARE the answer.
  */
object Graph {

  /** Large-star: for each node u with neighborhood Γ(u), attach every
    * v ∈ Γ(u) with v > u to m = min(Γ(u) ∪ {u}). Never emits self-loops
    * (m ≤ u < v). */
  private[graft] def largeStar(e: DataFrame): DataFrame = {
    val und = e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))
    val m = und.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    und.join(m, Seq("u")).filter(col("v") > col("u"))
      .select(col("v").as("a"), col("m").as("b"))
      .distinct()
  }

  /** Small-star: orient edges (u, v) with v < u; for each u attach
    * every smaller neighbor and u itself to m = min of them. */
  private[graft] def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("a"), col("b")).as("u"),
      least(col("a"), col("b")).as("v"))
    val m = dir.groupBy("u").agg(min("v").as("m"))
    dir.join(m, Seq("u"))
      .select(explode(array(col("u"), col("v"))).as("n"), col("m"))
      .filter(col("n") =!= col("m"))
      .select(col("n").as("a"), col("m").as("b"))
      .distinct()
  }

  /** (count, order-independent hash fold) of the edge set — one action.
    * XOR, not sum: ANSI mode would overflow a long sum, and the edge set
    * is distinct so XOR cancellation can't hide a difference of pairs. */
  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)),
      bit_xor(xxhash64(col("a"), col("b")))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Label every node of the undirected graph `edges` (columns `a`, `b`)
    * with its component's minimum node id. Output: (node, component),
    * one row per distinct node appearing in the edge list — callers
    * left-join and coalesce to cover isolated vertices. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    var e = edges
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    var prev = checksum(e)
    var converged = prev._1 == 0L
    var i = 0
    while (!converged && i < maxIter) {
      e = smallStar(largeStar(e)).localCheckpoint()
      val cur = checksum(e)
      converged = cur == prev
      prev = cur
      i += 1
    }
    require(converged, s"connectedComponents: not converged after $maxIter rounds")
    val roots = e.select(col("b").as("node")).distinct()
      .withColumn("component", col("node"))
    e.select(col("a").as("node"), col("b").as("component")).union(roots)
  }
}
