package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Storage-layout pruning gates for the `annee`-partitioned fact sink
  * (the layout Pipeline.run writes): a literal year predicate must prune
  * the partition listing (static pruning), and a join against a filtered
  * dim must prune it at runtime (dynamic partition pruning) — both
  * measured by files actually read, LayoutSpec-style, not by plan text
  * alone. This is the read-path payoff of partitioning the fact sink. */
class PruningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sink: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    sys.addShutdownHook(Streams.deleteRec(new java.io.File(dir)))
    Gold.buildFact(Tables.orders(spark, sf), Tables.customer(spark, sf),
      Tables.nation(spark, sf))
      .write.mode("overwrite").partitionBy("annee").parquet(dir)
    dir
  }

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] = {
    val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
    kids.filter(_.isFile).filter(_.getName.endsWith(".parquet")) ++
      kids.filter(_.isDirectory).flatMap(parquetFiles)
  }

  /** FileSourceScanExec leaves, reaching through AQE's plan wrapper. */
  private def fileScans(df: DataFrame): Seq[FileSourceScanExec] = {
    def walk(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case qs: QueryStageExec => walk(qs.plan)
      case s: FileSourceScanExec => Seq(s)
      case other =>
        other.children.flatMap(walk) ++
          other.subqueries.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("yearSlice: literal year predicate statically prunes the fact sink") {
    val q = Gold.yearSlice(spark.read.parquet(sink), 1995)
    val rows = q.collect()
    assert(rows.nonEmpty)
    val total = parquetFiles(new java.io.File(sink)).size
    val scan = fileScans(q).head
    assert(scan.metadata("PartitionFilters").contains("annee"),
      s"no partition filter in: ${scan.metadata("PartitionFilters")}")
    val read = scan.metrics("numFiles").value
    assert(read > 0 && read < total,
      s"read $read of $total files — listing was not pruned")
  }

  test("join against a filtered dim triggers dynamic partition pruning") {
    // the dim must be a real source (a LocalRelation's filter is folded
    // away at optimize time, leaving no selective predicate for the DPP
    // rule) and the filter column must not be derivable from the join
    // key (or constraint propagation would prune STATICALLY instead)
    val dimDir = java.nio.file.Files.createTempDirectory("graft_prune_dim").toString
    sys.addShutdownHook(Streams.deleteRec(new java.io.File(dimDir)))
    Seq((1995, "mid"), (1996, "mid"), (1993, "early"), (1997, "late"))
      .toDF("annee", "era").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("era") === "mid")
    val q = spark.read.parquet(sink).join(dim, Seq("annee"))
      .groupBy("annee").agg(count(lit(1)).as("n"))
    val rows = q.collect()
    assert(rows.map(_.getAs[Int]("annee")).sorted.toSeq == Seq(1995, 1996))
    // match the fact sink's exact path — "graft_prune" alone would also
    // match the "graft_prune_dim" scan if traversal order ever changed
    val scan = fileScans(q)
      .find(_.metadata("Location").contains(sink)).get
    assert(scan.partitionFilters.exists(
      _.exists(_.isInstanceOf[DynamicPruningExpression])),
      s"no dynamicpruning in: ${scan.partitionFilters}")
    val total = parquetFiles(new java.io.File(sink)).size
    val read = scan.metrics("numFiles").value
    assert(read > 0 && read < total,
      s"read $read of $total files — DPP did not skip any files")
  }
}
