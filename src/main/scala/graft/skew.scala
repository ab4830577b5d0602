package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns (SURVEY 100 TB posture: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join handling splits oversized SORT-MERGE JOIN partitions
  * automatically, but it does not help skewed AGGREGATIONS (a hot group
  * key still lands on one reducer for the final merge) and it can't split
  * a hot key across executors mid-stage. These helpers implement the
  * manual pattern; results are exactly equal to the unsalted operators
  * (asserted in SkewSpec) because the salt only re-partitions partial
  * state, never changes group membership.
  */
object Skew {

  /** Deterministic per-row salt in [0, salts): hash of all columns — no
    * rand(), so re-execution of a lost task reproduces the same salt. */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(salts.toLong))

  /** Two-stage salted sum aggregation: stage 1 shuffles on (key, salt),
    * spreading a hot key over `salts` reducers for the partial sums;
    * stage 2 merges the tiny per-salt partials. Sum must be over exact
    * values (longs / cents) for bit-equality with the direct groupBy. */
  def saltedSum(df: DataFrame, key: String, value: Column, salts: Int = 16,
      as: String = "sum"): DataFrame =
    df.withColumn("_salt", rowSalt(df, salts))
      .groupBy(col(key), col("_salt"))
      .agg(sum(value).as("_partial"), count(lit(1)).as("_n"))
      .groupBy(col(key))
      .agg(sum("_partial").as(as), sum("_n").as(s"${as}_count"))

  /** Salted inner equi-join for a hot-keyed left side: the right side is
    * replicated `salts` times (explode), the left side picks one salt
    * deterministically — the hot key's rows spread over `salts` join
    * partitions. Right-side replication cost ⇒ use only when the right
    * side is modest but too big (or too skewed downstream) to broadcast. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt", rowSalt(left, salts))
    val saltedRight = right
      .withColumn("_salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** Key-distribution profile — the DIAGNOSTIC that decides when the
    * salted tiers above earn their extra stage: top-N heaviest keys
    * with per-key share and cumulative share of all rows. A cum_share
    * that reaches ~1 within a handful of keys means the plain groupBy
    * concentrates the table on a few reducers (salt, or AQE skew-join);
    * a flat profile means salting would only add a stage. One key-grain
    * aggregate over the table; the window runs on the top-N frame
    * (N rows), never the key space. */
  def keySkewProfile(df: DataFrame, keyCol: String,
      topN: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("n"))
    // empty table → NULL total; the top-N frame below is empty anyway,
    // so any non-zero divisor yields the same zero-row profile (the
    // ANSI x/0 throw and the getLong NPE are what we're avoiding)
    val tot = Option(counts.agg(sum("n")).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(1L)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("n"), col("key"))
      .rowsBetween(Long.MinValue, 0)
    counts.orderBy(desc("n"), col("key")).limit(topN)
      .withColumn("share", round(col("n") / lit(tot), 6))
      .withColumn("cum_share", round(sum("n").over(w) / lit(tot), 6))
      .orderBy(desc("n"), col("key"))
  }
}
