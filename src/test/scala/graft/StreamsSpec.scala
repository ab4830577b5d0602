package graft

import org.apache.spark.sql.functions._

/** Streaming + multimodal extension plumbing. */
class StreamsSpec extends SparkSpec {

  test("streamed hourly aggregate equals the batch aggregate") {
    // cast heure to string on both sides: batch carries TIMESTAMP, the
    // streamed result TIMESTAMP_NTZ — same wall-clock under the UTC session
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("heure", date_format(col("heure"), "yyyy-MM-dd HH:mm:ss"))
      .orderBy("heure", "event_type")
      .collect().map(_.mkString("|")).toSeq
    val batch = canon(Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("heure"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value")))
    val streamed = canon(Streams.eventsHourlyStreamed(spark, sf))
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("multimodal decode: deterministic stub, frame fan-out, feature norm 1") {
    val docs = Tables.documents(spark, sf)
    val feats = Multimodal.multimodalFeatures(docs)
    val rows = feats.collect()
    assert(rows.nonEmpty)
    // audio/video docs fan out to n_frames rows
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, rs) =>
      assert(rs.length == rs.head.getAs[Int]("n_frames"))
    }
    // L1-normalized byte histogram sums to ~1 for non-empty frames
    assert(rows.forall { r =>
      val l1 = r.getAs[Double]("feat_l1")
      l1 >= 0.0 && l1 <= 1.000001
    })
    // determinism: run twice, same result
    val again = Multimodal.multimodalFeatures(docs).collect()
    assert(again.map(_.mkString("|")).toSeq == rows.map(_.mkString("|")).toSeq)
  }

  test("media catalog kinds are assigned deterministically by doc_id") {
    val kinds = Multimodal.mediaCatalog(Tables.documents(spark, sf))
      .collect().map(r => r.doc_id % 3 match {
        case 0 => r.kind == "image"
        case 1 => r.kind == "audio"
        case _ => r.kind == "video"
      })
    assert(kinds.forall(identity))
  }
}
