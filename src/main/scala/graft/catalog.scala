package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL surface (reference serving read path, SURVEY §3 entry point 3: the
  * Flask/Mongo layer collapses to views + ORDER BY/LIMIT queries).
  * Registers the test tables and, optionally, a Pipeline output's gold
  * tables as temp views so every engine capability is reachable from
  * `spark.sql(...)` text. */
object Catalog {

  /** Register the raw test tables (region…embeddings) as temp views.
    * Goes through the typed accessors — `events` needs its nanos→micros
    * conversion, a raw load fails on TIMESTAMP(NANOS). */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    val loaders: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "region" -> Tables.region, "nation" -> Tables.nation,
      "customer" -> Tables.customer, "supplier" -> Tables.supplier,
      "part" -> Tables.part, "orders" -> Tables.orders,
      "lineitem" -> Tables.lineitem, "events" -> Tables.events,
      "documents" -> Tables.documents, "embeddings" -> Tables.embeddings)
    loaders.foreach { case (name, fn) =>
      fn(spark, dir).createOrReplaceTempView(name)
    }
  }

  /** Register every gold table written by [[Pipeline.run]] as a
    * `gold_<name>` view. */
  def registerGold(spark: SparkSession, outDir: String): Unit = {
    val goldDir = new java.io.File(s"$outDir/gold")
    require(goldDir.isDirectory, s"no gold dir at $goldDir — run Pipeline first")
    goldDir.listFiles().filter(_.isDirectory).foreach { d =>
      spark.read.parquet(d.getAbsolutePath)
        .createOrReplaceTempView(s"gold_${d.getName.stripPrefix("gold_")}")
    }
    graft.functions.CosineSimilarity.register(spark)
  }

  /** Column-level table profiling (ANALYZE-style observability): per
    * column, the null count and exact distinct count, in ONE aggregation
    * pass (Catalyst expands once per distinct column — the standard
    * multi-distinct plan). Long output format so the profile of any table
    * lands in one fixed schema. At 100 TB swap `countDistinct` for
    * `approx_count_distinct` — same call shape, HLL merge instead of the
    * expand — which is why the column list, not the metric, is the
    * parameter here. */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => countDistinct(col(c)))

  /** [[tableProfile]]'s 100 TB form, as a real query rather than a doc
    * comment: HLL++ `approx_count_distinct` in place of the exact
    * multi-distinct. The exact plan Expands every input row once per
    * distinct column (7× row multiplication at 6 columns) and shuffles
    * the expansion; this one folds each column into a mergeable sketch
    * map-side — one pass, no row multiplication, constant-size partials
    * per column. Gated rows-only + a CatalogSpec relative-error bound
    * against the exact profile. */
  def tableProfileApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.02): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), rsd))

  private def profileWith(df: DataFrame, cols: Seq[String],
      distinctOf: String => org.apache.spark.sql.Column): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      distinctOf(c).as(s"${c}__distinct")))
    val stackArgs = cols.map(c => s"'$c', `${c}__nulls`, `${c}__distinct`")
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${cols.size}, $stackArgs) AS (column_name, n_null, n_distinct)")
      .orderBy("column_name")
  }

  /** Order-independent table checksum — the migration/backfill
    * validation primitive: "did the copy preserve every row?" answered
    * in ONE scan with NO sort and NO row movement beyond a 1-row
    * partial per task. Each row folds its canonical column values into
    * a modular polynomial hash (Horner over modulus M = 2³¹−1, every
    * intermediate &lt; 2⁶² so neither engine's bigint overflows — DuckDB
    * THROWS on bigint overflow, so wraparound hashes aren't portable);
    * the table digest is the plain SUM of row hashes, which any
    * partition order and any partial-aggregation tree reproduces
    * bit-for-bit. Two snapshots match ⇔ (n_rows, checksum) match (up
    * to the polynomial's collision bound; for adversarial settings
    * swap in a crypto hash — the SHAPE, one scan + commutative
    * combine, is the point at 100 TB). */
  def tableChecksum(orders: DataFrame): DataFrame = {
    val M = 2147483647L
    val A = 1000003L
    def step(acc: Column, v: Column): Column = (acc * A + v) % M
    val h = step(step(step(step(
      col("o_orderkey") % M,
      col("o_custkey") % M),
      ascii(col("o_orderstatus"))),
      Tables.cents(col("o_totalprice")) % M),
      datediff(col("o_orderdate").cast("date"), to_date(lit("1970-01-01"))))
    // empty table → sum is NULL; pin the empty digest to 0 so callers
    // (compaction audits) compare longs, never NPE — 0 is unreachable
    // for non-empty input only up to collision, but n_rows disambiguates
    orders.agg(count(lit(1)).as("n_rows"),
      coalesce(sum(h), lit(0L)).as("checksum"))
  }

  /** The reference API's `fetch_collection` shape
    * (serving_api/repository.py:26-42): view + column projection + dynamic
    * sort + limit; fails like the API's 503 when the collection is empty.
    * `fields` mirrors the Mongo projection dict (the `{_id: false}` /
    * field-select layer) — empty means all columns; unknown fields fail
    * analysis like the API's 400. Projection is applied before the sort
    * so the scan only reads the requested columns (sort keys must be in
    * the projection, as in the reference API). */
  def fetchCollection(spark: SparkSession, view: String, sortSpec: String = "",
      limit: Int = 5000, fields: Seq[String] = Nil): DataFrame = {
    val df = spark.table(view)
    require(!df.isEmpty, s"collection '$view' is empty")
    val projected = if (fields.isEmpty) df else df.select(fields.map(col): _*)
    val sorted = if (sortSpec.isEmpty) projected
      else projected.orderBy(Serving.parseSortSpec(sortSpec): _*)
    sorted.limit(limit)
  }
}
