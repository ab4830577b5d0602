package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.10): image/audio/video treated as
  * opaque `binary` payloads with typed metadata, processed in distributed
  * batches via typed `Dataset.mapPartitions` (the Scala analog of
  * mapInPandas batch UDFs).
  *
  * The payloads are REAL container formats — 24bpp BMP images, PCM16 WAV
  * audio, YUV4MPEG2 (y4m) video — synthesized deterministically from each
  * document's bytes (the container genuinely has no image/audio
  * libraries, so the fixtures are written header-correct by [[MediaGen]]),
  * and [[MediaCodec.decode]] parses the actual headers: BMP dimensions
  * from the LE32 fields at offsets 18/22, WAV sample count by walking
  * RIFF chunks to `data`, y4m geometry from the plain-text header and
  * frame count by walking FRAME markers. Container sizes are closed-form
  * in the text length, so `media_meta` stays fully oracle-checkable.
  */
object Multimodal {

  /** Catalog row: an opaque media payload + routing metadata. */
  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])

  /** Decoded/feature-extracted row (one per frame sample). */
  case class MediaFeature(doc_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, frame_idx: Int,
      feature: Array[Double])

  /** Deterministic fixture writers for real container formats. Content
    * bytes cycle the source text so payloads vary per document. */
  object MediaGen {
    private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
      b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
    }
    private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    }
    private def fill(b: Array[Byte], off: Int, n: Int, src: Array[Byte]): Unit = {
      val s = if (src.isEmpty) Array[Byte](0) else src
      var i = 0
      while (i < n) { b(off + i) = s(i % s.length); i += 1 }
    }

    /** BMP dimensions from the text length; width stays a multiple of 4
      * so the 24bpp row stride needs no padding (3w ≡ 0 mod 4). */
    def bmpDims(textLen: Int): (Int, Int) =
      (4 * (2 + textLen % 15), 2 + textLen % 11)

    /** 24bpp bottom-up BMP: 14-byte file header + 40-byte info header +
      * 3wh pixel bytes. Total size 54 + 3wh. */
    def bmp(text: Array[Byte]): Array[Byte] = {
      val (w, h) = bmpDims(text.length)
      val data = 3 * w * h
      val b = new Array[Byte](54 + data)
      b(0) = 'B'; b(1) = 'M'
      le32(b, 2, b.length); le32(b, 10, 54)
      le32(b, 14, 40); le32(b, 18, w); le32(b, 22, h)
      le16(b, 26, 1); le16(b, 28, 24)
      le32(b, 34, data)
      fill(b, 54, data, text)
      b
    }

    /** Canonical 44-byte PCM WAV, mono 16-bit 8 kHz, one sample per text
      * byte. Total size 44 + 2·len. */
    def wav(text: Array[Byte]): Array[Byte] = {
      val data = 2 * text.length
      val b = new Array[Byte](44 + data)
      b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
      le32(b, 4, b.length - 8)
      b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
      b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
      le32(b, 16, 16); le16(b, 20, 1); le16(b, 22, 1)
      le32(b, 24, 8000); le32(b, 28, 16000); le16(b, 32, 2); le16(b, 34, 16)
      b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
      le32(b, 40, data)
      var i = 0
      while (i < text.length) {
        le16(b, 44 + 2 * i, ((text(i) & 0xff) - 128) << 8); i += 1
      }
      b
    }

    val Y4mWidth = 32
    val Y4mHeight = 16
    /** 4:2:0 frame payload bytes: wh luma + wh/2 chroma. */
    val Y4mFrameBytes: Int = Y4mWidth * Y4mHeight * 3 / 2
    private val y4mHeader = s"YUV4MPEG2 W$Y4mWidth H$Y4mHeight F25:1 Ip A1:1\n"

    /** YUV4MPEG2 stream: 32-byte text header, then per frame a FRAME
      * marker line + 768 raw 4:2:0 bytes. 1 + len%4 frames; total size
      * 32 + frames·774. */
    def y4m(text: Array[Byte]): Array[Byte] = {
      val frames = 1 + text.length % 4
      val head = y4mHeader.getBytes("US-ASCII")
      val marker = "FRAME\n".getBytes("US-ASCII")
      val b = new Array[Byte](head.length + frames * (marker.length + Y4mFrameBytes))
      System.arraycopy(head, 0, b, 0, head.length)
      var off = head.length
      for (_ <- 0 until frames) {
        System.arraycopy(marker, 0, b, off, marker.length)
        fill(b, off + marker.length, Y4mFrameBytes, text)
        off += marker.length + Y4mFrameBytes
      }
      b
    }
  }

  /** Real header-parsing decoder. Throws on malformed payloads — an
    * engine must surface corrupt media, not fabricate metadata. */
  object MediaCodec {
    private def le32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    /** Samples per audio feature window. */
    val WavWindow = 2000

    /** (width, height, n_frames) parsed from the container bytes. */
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) = kind match {
      case "image" =>
        require(payload.length >= 54 && payload(0) == 'B' && payload(1) == 'M',
          s"not a BMP (${payload.length} bytes)")
        // hostile header bytes can encode negative dimensions; reject them
        // as a typed error instead of emitting nonsense metadata — same
        // posture as the y4m geometry guard below
        val (w, h) = (le32(payload, 18), le32(payload, 22))
        require(w >= 0 && h >= 0, s"bad BMP geometry ${w}x$h")
        (w, h, 1)
      case "audio" =>
        // ceil(samples / window), floored at 1: an exact-multiple data
        // length must NOT grow a phantom empty trailing window (at corpus
        // scale 1-in-window_size files land exactly on the boundary), and
        // a zero-length data chunk still reports one (empty) window
        val dn = wavDataRange(payload)._2
        (0, 0, math.max(1, (dn + 2 * WavWindow - 1) / (2 * WavWindow)))
      case _ =>
        val header = y4mHeaderString(payload)
        val dims = header.split(" ").toSeq
        // toIntOption, not toInt: a corrupt header must fail as a typed
        // IllegalArgumentException, never a NumberFormatException
        def num(prefix: String): Int = dims.collectFirst {
          case t if t.startsWith(prefix) => t.drop(1)
        }.flatMap(_.toIntOption).getOrElse(
          throw new IllegalArgumentException(s"y4m header missing $prefix"))
        val (w, h) = (num("W"), num("H"))
        // bound the geometry BEFORE deriving the frame stride: w*h*3/2
        // from hostile bytes can be zero, negative, or overflow Int, any
        // of which turns the marker walk into an infinite loop
        require(w > 0 && h > 0 && w.toLong * h * 3 / 2 <= Int.MaxValue,
          s"bad y4m geometry ${w}x$h")
        // walk FRAME markers, skipping each frame's raw 4:2:0 bytes;
        // every read is bounds-checked — truncated/corrupt streams must
        // reject, not run off the array or hang an executor. The stride is
        // computed in Long and narrowed once guard-bounded: the Int form
        // w*h*3/2 wraps for geometries the Long guard admits (e.g. W4
        // H357913940 → Int w*h*3 = -16), turning the walk into a spin
        val frameBytes = (w.toLong * h * 3 / 2).toInt
        var off = header.length + 1
        var frames = 0
        while (off < payload.length) {
          // Long sum: off + 6 wraps Int for a payload within 6 bytes of the
          // JVM array ceiling, passing the guard and landing tag() on an
          // untyped StringIndexOutOfBoundsException instead of the reject
          require(off.toLong + 6 <= payload.length && tag(payload, off) == "FRAM",
            s"bad y4m frame marker at $off")
          while (off < payload.length && payload(off) != '\n') off += 1
          require(off < payload.length, s"unterminated y4m FRAME line")
          // advance in Long: off + 1 + frameBytes wraps Int for a stride
          // near Int.MaxValue, making the truncation require pass vacuously
          // and the next tag read land at a negative index
          val next = off.toLong + 1 + frameBytes
          frames += 1
          require(next <= payload.length,
            s"truncated y4m frame $frames: payload ends at ${payload.length}, frame at $next")
          off = next.toInt
        }
        (w, h, frames)
    }

    /** (offset, byteLength) of the WAV data chunk, walking RIFF chunks. */
    private[graft] def wavDataRange(payload: Array[Byte]): (Int, Int) = {
      require(payload.length >= 44 && tag(payload, 0) == "RIFF" &&
        tag(payload, 8) == "WAVE", s"not a WAV (${payload.length} bytes)")
      // bounds-checked RIFF walk: a hostile chunk size can be negative
      // (off walks backward — infinite loop) or overshoot the payload
      // (out-of-bounds tag read); both must reject as typed errors
      // Long sums throughout the walk: off + 8 wraps Int when the payload
      // sits within 8 bytes of the JVM array ceiling, so an Int guard would
      // pass vacuously and tag() would throw untyped instead of rejecting
      var off = 12
      while (off.toLong + 8 <= payload.length && tag(payload, off) != "data") {
        val sz = le32(payload, off + 4)
        // Long arithmetic: off + 8 + sz overflows Int for a hostile size,
        // landing off negative and the next tag read out of bounds
        val next = off.toLong + 8 + sz
        require(sz >= 0 && next <= payload.length,
          s"RIFF chunk at $off (size $sz) overruns the ${payload.length}-byte payload")
        off = next.toInt
      }
      require(off.toLong + 8 <= payload.length, s"WAV has no data chunk")
      val dn = le32(payload, off + 4)
      // Long bound, same as the chunk walk above: an Int sum wraps negative
      // for dn near Int.MaxValue and the require passes on a corrupt payload
      require(dn >= 0 && off.toLong + 8 + dn <= payload.length,
        s"WAV data chunk ($dn bytes at ${off + 8}) overruns the " +
          s"${payload.length}-byte payload")
      (off + 8, dn)
    }

    /** Per-frame feature: 8-bin byte histogram over the frame's OWN data
      * region (pixels / sample window / frame plane), L1-normalized. */
    def features(kind: String, payload: Array[Byte], frameIdx: Int,
        nFrames: Int): Array[Double] = {
      val (start, end) = kind match {
        case "image" => (54, payload.length)
        case "audio" =>
          val (d0, dn) = wavDataRange(payload)
          (d0 + 2 * WavWindow * frameIdx,
            math.min(d0 + 2 * WavWindow * (frameIdx + 1), d0 + dn))
        case _ =>
          val headerLen = y4mHeaderString(payload).length + 1
          val stride = 6 + MediaGen.Y4mFrameBytes
          (headerLen + stride * frameIdx + 6, headerLen + stride * (frameIdx + 1))
      }
      val bins = new Array[Double](8)
      var i = start
      while (i < end) { bins((payload(i) & 0xff) / 32) += 1.0; i += 1 }
      val total = math.max(end - start, 1).toDouble
      bins.map(_ / total)
    }

    private def y4mHeaderString(payload: Array[Byte]): String = {
      require(payload.length >= 10 &&
        new String(payload, 0, 9, "US-ASCII") == "YUV4MPEG2",
        s"not a y4m stream (${payload.length} bytes)")
      new String(payload.takeWhile(_ != '\n'), "US-ASCII")
    }
  }

  /** Build a media catalog from the documents table: each text becomes a
    * real container payload (BMP / WAV / y4m round-robin by doc_id),
    * synthesized per-partition with no driver round-trip. */
  def mediaCatalog(documents: DataFrame): Dataset[MediaRow] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val bytes = Option(text).getOrElse("").getBytes("UTF-8")
        id % 3 match {
          case 0 => MediaRow(id, "image", MediaGen.bmp(bytes))
          case 1 => MediaRow(id, "audio", MediaGen.wav(bytes))
          case _ => MediaRow(id, "video", MediaGen.y4m(bytes))
        }
      })
  }

  /** Distributed decode + frame-sample + feature-extract: one partition =
    * one batch, rows processed without any driver round-trip. */
  def decodeFeatures(catalog: Dataset[MediaRow]): Dataset[MediaFeature] = {
    val spark = catalog.sparkSession
    import spark.implicits._
    catalog.mapPartitions { rows =>
      rows.flatMap { r =>
        val (w, h, frames) = MediaCodec.decode(r.kind, r.payload)
        (0 until frames).iterator.map { f =>
          MediaFeature(r.doc_id, r.kind, r.payload.length.toLong, w, h,
            frames, f, MediaCodec.features(r.kind, r.payload, f, frames))
        }
      }
    }
  }

  /** Oracle-checkable metadata projection: container sizes are closed-form
    * in the text length (BMP 54+3wh, WAV 44+2n, y4m 32+frames·774). */
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
