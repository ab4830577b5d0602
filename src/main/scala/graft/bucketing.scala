package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support (SURVEY 100 TB posture: "co-locate joins via
  * bucketing"). Writing both sides of a recurring join bucketed on the
  * join key eliminates the shuffle from every subsequent join — the
  * amortization that matters when the fact table is re-joined daily at
  * 100 TB. Local-mode saveAsTable uses the session catalog; passing
  * `path` makes the table EXTERNAL at that location (bucket metadata
  * still lives in the catalog — bucketing is a catalog property, which
  * is why `spark.read.parquet` on the same files would NOT get the
  * shuffle elision). On a cluster this is the same API over the
  * metastore. */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, sortCol: Option[String] = None,
      path: Option[String] = None): Unit = {
    val w0 = df.write.mode("overwrite").bucketBy(buckets, bucketCol)
    val w1 = sortCol.fold(w0)(c => w0.sortBy(c))
    val w = path.fold(w1)(p => w1.option("path", p))
    w.format("parquet").saveAsTable(table)
  }

  /** Write orders and lineitem bucketed on the order key; returns the
    * join of the bucketed tables (plan contains no shuffle exchange —
    * asserted in BucketingSpec). `suffix` disambiguates the catalog
    * table names — catalog names are SESSION-global, so two data dirs
    * evaluated in one session must not share them (a second dir's
    * overwrite would silently repoint the first dir's tables). */
  def cooLocatedOrderLines(spark: SparkSession, dir: String, buckets: Int = 8,
      path: Option[String] = None, suffix: String = ""): DataFrame = {
    writeBucketed(Tables.orders(spark, dir).withColumnRenamed("o_orderkey", "key"),
      s"graft_orders_b$suffix", "key", buckets, path = path.map(_ + "/orders_b"))
    writeBucketed(Tables.lineitem(spark, dir).withColumnRenamed("l_orderkey", "key"),
      s"graft_lineitem_b$suffix", "key", buckets, path = path.map(_ + "/lineitem_b"))
    spark.table(s"graft_orders_b$suffix")
      .join(spark.table(s"graft_lineitem_b$suffix"), Seq("key"))
  }
}
