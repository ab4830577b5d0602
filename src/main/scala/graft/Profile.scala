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
