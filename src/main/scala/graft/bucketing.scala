package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support (SURVEY 100 TB posture: "co-locate joins via
  * bucketing"). Writing both sides of a recurring join bucketed on the
  * join key eliminates the shuffle from every subsequent join — the
  * amortization that matters when the fact table is re-joined daily at
  * 100 TB. Local-mode saveAsTable uses the session's spark-warehouse;
  * on a cluster this is the same API over the metastore. */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }

  /** Write orders and lineitem bucketed on the order key; returns the
    * join of the bucketed tables (plan contains no shuffle exchange —
    * asserted in BucketingSpec). */
  def cooLocatedOrderLines(spark: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    writeBucketed(Tables.orders(spark, dir).withColumnRenamed("o_orderkey", "key"),
      "graft_orders_b", "key", buckets)
    writeBucketed(Tables.lineitem(spark, dir).withColumnRenamed("l_orderkey", "key"),
      "graft_lineitem_b", "key", buckets)
    spark.table("graft_orders_b").join(spark.table("graft_lineitem_b"), Seq("key"))
  }
}
