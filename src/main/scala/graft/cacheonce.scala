package graft

import org.apache.spark.sql.DataFrame

/** Explicit cache registry for intermediates that one query uses twice
  * (minhash signatures, LSH buckets, candidate pairs, …).
  *
  * Calling `.cache()` on a freshly built identical plan per invocation
  * "works" only through the CacheManager's canonical-plan matching: every
  * repeat logs `Asked to cache already cached data`, adds a registry
  * entry, and keeps no handle anything could ever unpersist. This memo
  * builds the cached frame once per (session, canonical plan) — the same
  * equality the CacheManager itself uses — hands every later invocation
  * the SAME DataFrame, and [[releaseAll]] can drop the lot (Bench/Verify
  * sessions are long-lived; a leaked registry grows per query). */
object CacheOnce {
  private val memo = new Tables.SessionMemo[Int, DataFrame]

  def apply(df: DataFrame): DataFrame =
    memo.getOrElseUpdate(df.sparkSession,
      df.queryExecution.analyzed.semanticHash(), df.cache())

  /** Unpersist every registered frame (blocking=false: executors drop
    * blocks asynchronously). */
  def releaseAll(): Unit = {
    memo.values.foreach(_.unpersist(false))
    memo.clear()
  }
}
