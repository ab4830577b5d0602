package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming extension (SURVEY §2.8 — the reference is
  * batch-only; the `events` table makes event-time windowed aggregation a
  * first-class extension here).
  *
  * The same tumbling-hour aggregate as the batch `events_hourly` query,
  * expressed as a streaming job: parquet file source → event-time window
  * + watermark → stateful aggregation → sink. In production the source
  * would be Kafka/files-arriving and the sink a table/topic; for the
  * correctness gate we drive it with Trigger.AvailableNow over the static
  * parquet and materialize via the memory sink, so the result is exactly
  * comparable to the batch oracle.
  */
object Streams {

  private val runId = new AtomicInteger(0)

  /** Raw events stream over the test parquet (nanos ts → TIMESTAMP_NTZ,
    * same conversion as Tables.events). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val static = spark.read.parquet(s"$dir/events.parquet")
    val raw = spark.readStream
      .schema(static.schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    // keep TimestampType (not NTZ): watermarks require an instant-typed
    // event time; the session runs UTC so wall-clock values are unchanged
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Tumbling 1-hour event-time aggregation with a watermark. Watermark is
    * a no-op under complete output but defines the late-data contract the
    * production append-mode job would have. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("window.start").cast("timestamp_ntz").as("heure"), col("event_type"),
        col("n_events"), col("total_value"))

  // ------------------------------------------------- stateful sessionization

  case class SessionEvent(user_id: Long, tsMicros: Long, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, duration_sec: Long, n_events: Long,
      total_value: Double)

  /** Custom streaming state machine via flatMapGroupsWithState: per-user
    * 30-min-gap sessionization. Emits a session when the NEXT event opens
    * a new one — i.e. only closed sessions; each user's final session
    * stays in state (would emit on watermark timeout in a production
    * append job). Events are sorted within each micro-batch before
    * folding into state. */
  def sessionizeStream(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("tsMicros"), col("value"))
      .as[SessionEvent]

    def fold(userId: Long, it: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[ClosedSession] = {
      val evs = it.toSeq.sortBy(_.tsMicros)
      var st = state.getOption.orNull
      val out = Seq.newBuilder[ClosedSession]
      for (e <- evs) {
        if (st == null) st = SessionState(e.tsMicros, e.tsMicros, 1, e.value)
        else if (e.tsMicros - st.last > gapSeconds * 1000000L) {
          out += close(userId, st)
          st = SessionState(e.tsMicros, e.tsMicros, 1, e.value)
        } else st = SessionState(st.start, e.tsMicros, st.n + 1, st.sum + e.value)
      }
      if (st != null) state.update(st)
      out.result().iterator
    }

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fold)
      .toDF()
  }

  private def close(userId: Long, st: SessionState): ClosedSession =
    ClosedSession(userId,
      java.sql.Timestamp.from(java.time.Instant.EPOCH.plusNanos(st.start * 1000)),
      java.sql.Timestamp.from(java.time.Instant.EPOCH.plusNanos(st.last * 1000)),
      (st.last - st.start) / 1000000L, st.n,
      math.round(st.sum * 100.0) / 100.0)

  /** Keyed upsert parquet sink via foreachBatch (the Spark analog of the
    * reference's Mongo ReplaceOne-upsert publisher,
    * serving_mongo/publish_gold_to_mongo.py:91-100 — SURVEY S5): each
    * micro-batch replaces rows sharing its keys (batch wins), others
    * survive. Without a transactional table format this stages the merge
    * and swaps directories — atomic enough for a local serving copy;
    * production would target Delta/Iceberg MERGE with the same batch fn. */
  def upsertByKey(spark: SparkSession, sinkDir: String, key: String)(
      batch: DataFrame): Unit = {
    val target = new java.io.File(sinkDir, "current")
    val merged =
      if (target.isDirectory) {
        val existing = spark.read.parquet(target.getAbsolutePath)
        existing.join(batch.select(key).distinct(), Seq(key), "left_anti")
          .unionByName(batch)
      } else batch
    val staging = new java.io.File(sinkDir, s"staging_${System.nanoTime()}")
    merged.write.mode("overwrite").parquet(staging.getAbsolutePath)
    // swap: rename old out, staging in
    val old = new java.io.File(sinkDir, s"old_${System.nanoTime()}")
    if (target.isDirectory) target.renameTo(old)
    staging.renameTo(target)
    if (old.isDirectory) old.listFiles().foreach(_.delete())
    old.delete()
  }

  /** Streaming job publishing per-user running aggregates with
    * upsert-by-key semantics (update output mode → foreachBatch sink). */
  def userTotalsUpserted(spark: SparkSession, dir: String, sinkDir: String): DataFrame = {
    val agg = eventsStream(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
    val q = agg.writeStream
      .outputMode("update")
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        upsertByKey(spark, sinkDir, "user_id")(batch.toDF()))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(s"$sinkDir/current").orderBy("user_id")
  }

  /** Streaming exact dedup by event_id with watermark-bounded state
    * (dropDuplicatesWithinWatermark): late duplicates beyond the
    * watermark age out of state instead of growing it forever — the
    * streaming twin of the batch exact-dedup operator. */
  def eventsDedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run the streaming dedup over a doubled event stream (every file read
    * twice) and return the surviving rows — proves duplicate suppression
    * across the stream. */
  def eventsDedupStreamed(spark: SparkSession, dir: String): DataFrame = {
    val name = s"graft_dedup_stream_${runId.incrementAndGet()}"
    val src = eventsStream(spark, dir)
    val q = eventsDedupStream(src.union(src))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("event_id")
  }

  /** Run the streaming sessionizer over the static events parquet; returns
    * the closed sessions. */
  def eventSessionsStreamed(spark: SparkSession, dir: String): DataFrame = {
    val name = s"graft_sessions_stream_${runId.incrementAndGet()}"
    val q = sessionizeStream(eventsStream(spark, dir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("user_id", "session_start")
  }

  /** Run the streaming hourly aggregate to completion over the static
    * events parquet and return the materialized result — the streaming
    * twin of the batch `events_hourly` query, checked against the same
    * DuckDB oracle. */
  def eventsHourlyStreamed(spark: SparkSession, dir: String): DataFrame = {
    val name = s"graft_events_stream_${runId.incrementAndGet()}"
    val q = hourlyAgg(eventsStream(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).orderBy("heure", "event_type")
  }
}
