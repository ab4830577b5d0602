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
}
