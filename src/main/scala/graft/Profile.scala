package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc profiling entry (dev tool, not part of the driver contract). */
object Profile {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.1fs ($n rows)")
  }

  def mat(df: DataFrame): Long = { // materialize every column
    df.write.mode("overwrite").parquet("/tmp/profile_out")
    df.sparkSession.read.parquet("/tmp/profile_out").count()
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1) match {
      case Array("sql", query @ _*) =>
        Catalog.registerTables(spark, d)
        spark.sql(query.mkString(" ")).show(20, false)
      case Array("skew") =>
        import org.apache.spark.sql.functions._
        // hot-key demo over real data: salted vs direct revenue by country
        val fact = Gold.buildFact(Tables.orders(spark, d),
          Tables.customer(spark, d), Tables.nation(spark, d))
        val direct = fact.groupBy("pays")
          .agg(sum(Tables.cents(col("o_totalprice"))).as("sum"),
            count(lit(1)).as("sum_count"))
        val salted = Skew.saltedSum(fact, "pays", Tables.cents(col("o_totalprice")))
        val diff = direct.join(salted, Seq("pays"))
          .filter(direct("sum") =!= salted("sum")).count()
        println(s"[profile] salted-vs-direct mismatches: $diff (rows ${salted.count()})")
      case Array("sessions") =>
        import org.apache.spark.sql.expressions.Window
        import org.apache.spark.sql.functions._
        val batch = Serving.eventSessions(Tables.events(spark, d))
        val w = Window.partitionBy("user_id")
        val closed = batch.withColumn("mx", max("session_seq").over(w))
          .filter(col("session_seq") < col("mx"))
        val streamed = Streams.eventSessionsStreamed(spark, d)
        val b = closed.groupBy("user_id").count().withColumnRenamed("count", "nb")
        val s = streamed.groupBy("user_id").count().withColumnRenamed("count", "ns")
        val cmp = b.join(s, Seq("user_id"), "full").filter(
          coalesce(col("nb"), lit(-1)) =!= coalesce(col("ns"), lit(-1)))
        cmp.orderBy("user_id").show(30)
        val u = cmp.select("user_id").collect().headOption.map(_.getLong(0))
        u.foreach { uid =>
          println(s"--- user $uid batch closed:")
          closed.filter(col("user_id") === uid).orderBy("session_start").show(50, false)
          println(s"--- user $uid streamed:")
          streamed.filter(col("user_id") === uid).orderBy("session_start").show(50, false)
        }
      case Array("explain", names @ _*) =>
        names.foreach { n =>
          println(s"========== $n ==========")
          println(SparkEntry.queries(n)(spark, d).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        }
      case _ =>
        val docs = Tables.documents(spark, d)
        time("signatures")(mat(Llm.minhashSignatures(docs)))
        time("candidates")(mat(Llm.minhashCandidates(docs)))
        time("dedupMinhash")(mat(Llm.dedupMinhash(docs)))
        time("simhashDocs")(mat(Llm.simhashDocs(docs)))
        time("dedupSimhash")(mat(Llm.dedupSimhash(docs)))
        spark.stop()
    }
  }
}
