package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.10): image/audio/video treated as
  * opaque `binary` payloads with typed metadata, processed in distributed
  * batches via typed `Dataset.mapPartitions` (the Scala analog of
  * mapInPandas batch UDFs).
  *
  * The actual codec work is STUBBED — this container has no image/audio
  * libraries — with a deterministic fake decoder, but the Spark-side
  * plumbing (schema, binary payloads, partition-batched processing,
  * output schema) is real and tested. A production deployment swaps
  * [[MultimodalStub.decode]] for a real codec; nothing else changes.
  */
object Multimodal {

  /** Catalog row: an opaque media payload + routing metadata. */
  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])

  /** Decoded/feature-extracted row (one per frame sample). */
  case class MediaFeature(doc_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, frame_idx: Int,
      feature: Array[Double])

  /** Build a media catalog from the documents table: payload = UTF-8
    * bytes of the text (stand-in for real image/audio/video bytes), kind
    * assigned deterministically. */
  def mediaCatalog(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** STUB decoder — deterministic fake in place of a real codec.
    * Replace with e.g. javax.imageio / ffmpeg bindings in production. */
  object MultimodalStub {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      kind match {
        case "image" => (64 + n % 64, 64 + (n / 64) % 64, 1)
        case "audio" => (0, 0, 1 + n % 8) // "frames" = sample windows
        case _ => (32 + n % 32, 32 + (n / 32) % 32, 1 + n % 4)
      }
    }

    /** Fake per-frame feature: 8-bin byte histogram, L1-normalized. */
    def features(payload: Array[Byte], frameIdx: Int, nFrames: Int): Array[Double] = {
      val bins = new Array[Double](8)
      val start = (payload.length.toLong * frameIdx / nFrames).toInt
      val end = (payload.length.toLong * (frameIdx + 1) / nFrames).toInt
      var i = start
      while (i < end) { bins((payload(i) & 0xff) / 32) += 1.0; i += 1 }
      val total = math.max(end - start, 1).toDouble
      bins.map(_ / total)
    }
  }

  /** Distributed decode + frame-sample + feature-extract: one partition =
    * one batch, rows processed without any driver round-trip. */
  def decodeFeatures(catalog: Dataset[MediaRow]): Dataset[MediaFeature] = {
    val spark = catalog.sparkSession
    import spark.implicits._
    catalog.mapPartitions { rows =>
      rows.flatMap { r =>
        val (w, h, frames) = MultimodalStub.decode(r.kind, r.payload)
        (0 until frames).iterator.map { f =>
          MediaFeature(r.doc_id, r.kind, r.payload.length.toLong, w, h,
            frames, f, MultimodalStub.features(r.payload, f, frames))
        }
      }
    }
  }

  /** Oracle-checkable metadata projection (byte lengths are real even
    * though the codec is stubbed). */
  def mediaMeta(documents: DataFrame): DataFrame =
    mediaCatalog(documents).toDF()
      .select(col("doc_id"), col("kind"),
        length(col("payload")).cast("long").as("n_bytes"))
      .orderBy("doc_id")

  /** Rows-only query: full decode path, feature vector norm summarized. */
  def multimodalFeatures(documents: DataFrame): DataFrame =
    decodeFeatures(mediaCatalog(documents)).toDF()
      .withColumn("feat_l1", round(aggregate(col("feature"), lit(0.0), (a, x) => a + x), 6))
      .select("doc_id", "kind", "n_bytes", "width", "height", "n_frames",
        "frame_idx", "feat_l1")
      .orderBy("doc_id", "frame_idx")
}
