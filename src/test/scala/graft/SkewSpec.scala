package graft

import org.apache.spark.sql.functions._

/** Salted operators must be value-equal to their unsalted forms. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private lazy val skewed = (1 to 10000).map { i =>
    val key = if (i % 10 != 0) 1L else (i % 50).toLong
    (key, (i % 997).toLong, s"p$i")
  }.toDF("k", "v", "payload")

  test("saltedSum equals direct groupBy sum on a 90%-hot key") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("sum"), count(lit(1)).as("sum_count"))
      .orderBy("k").collect()
    val salted = Skew.saltedSum(skewed, "k", col("v")).orderBy("k").collect()
    assert(salted.map(_.toString).toSeq == direct.map(_.toString).toSeq)
  }

  test("saltedJoin equals plain inner join") {
    val dim = (0 to 49).map(i => (i.toLong, s"dim$i")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).orderBy("k", "v", "payload")
      .collect().map(_.toString)
    val salted = Skew.saltedJoin(skewed, dim, "k").orderBy("k", "v", "payload")
      .collect().map(_.toString)
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
  }

  test("AQE splits the hot partition of a skewed sort-merge join at runtime") {
    // the suite's 100 TB posture claims AQE handles residual skew the
    // salting tiers don't pre-treat — pin that the machinery actually
    // fires: a 90%-hot-key self-join under lowered skew thresholds must
    // show a skew=true sort-merge join in the FINAL adaptive plan
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val base = (1 to 2000).map { i =>
        (if (i % 10 != 0) 1L else (i % 50).toLong, i.toLong, s"p$i")
      }.toDF("k", "v", "payload")
      val right = base.select(col("k"), col("v").as("w"))
      // the BARE join, no keyed operator above it: a downstream groupBy
      // on k would require hash distribution, and AQE refuses to split
      // skewed partitions when that would break a required distribution
      // (that case is exactly what the salting tiers pre-treat)
      val joined = base.join(right, Seq("k"))
      // execute THIS dataframe's own QueryExecution (write/count/foreach
      // all plan a fresh one and would leave this plan un-adapted)
      joined.queryExecution.toRdd.foreach(_ => ())
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(2000))
      // correctness: total joined rows = Σ cnt(k)² over both sides
      val expected = base.groupBy("k").count().collect()
        .map(r => r.getLong(1) * r.getLong(1)).sum
      assert(joined.count() == expected)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
