package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.Multimodal.{MediaCodec, MediaGen}

/** Hostile-bytes fuzz for the media codec: at corpus scale an engine
  * decodes billions of externally-sourced binary payloads, so a corrupt
  * container must fail as a typed IllegalArgumentException in bounded
  * time — never an ArrayIndexOutOfBounds, a NumberFormatException, or
  * (the worst failure mode) an unbounded RIFF/FRAME walk that hangs an
  * executor thread. Pure driver-side properties (the codec is plain
  * Scala), so the case counts can be generous.
  */
object MultimodalProps extends Properties("MediaCodec") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(sys.env.getOrElse("GRAFT_FUZZ_N", "200").toInt)

  private val kinds = Seq("image", "audio", "video")

  /** decode returned, or rejected with the one documented exception type. */
  private def decodesOrRejects(kind: String, payload: Array[Byte]): Prop =
    try { MediaCodec.decode(kind, payload); Prop.passed }
    catch {
      case _: IllegalArgumentException => Prop.passed
      case t: Throwable => Prop.falsified :|
        s"$kind/${payload.length}B leaked ${t.getClass.getSimpleName}: ${t.getMessage}"
    }

  private val genBytes: Gen[Array[Byte]] = for {
    n <- Gen.frequency(3 -> Gen.choose(0, 64), 2 -> Gen.choose(0, 4096))
    b <- Gen.containerOfN[Array, Byte](n, Gen.choose(-128, 127).map(_.toByte))
  } yield b

  property("random bytes decode or reject as IllegalArgumentException") =
    Prop.forAll(genBytes, Gen.oneOf(kinds))(
      (bytes, kind) => decodesOrRejects(kind, bytes))

  private val genText: Gen[Array[Byte]] = for {
    n <- Gen.frequency(4 -> Gen.choose(0, 600), 1 -> Gen.oneOf(0, 1, 2000, 4000))
    b <- Gen.containerOfN[Array, Byte](n, Gen.choose(-128, 127).map(_.toByte))
  } yield b

  private def genValid(text: Array[Byte]): Gen[(String, Array[Byte])] =
    Gen.oneOf(("image", MediaGen.bmp(text)), ("audio", MediaGen.wav(text)),
      ("video", MediaGen.y4m(text)))

  /** Corruptions a 100 TB blob store actually serves: bit rot (single
    * overwritten byte — header fields, chunk sizes, markers), truncation
    * (partial upload), and trailing garbage (concatenated objects). */
  property("corrupted valid payloads decode or reject, never crash") =
    Prop.forAll(genText.flatMap(genValid), Gen.choose(0, Int.MaxValue),
      Gen.choose(-128, 127).map(_.toByte), Gen.choose(0, 2)) {
      case ((kind, valid), pos, junk, mode) =>
        val corrupt = mode match {
          case 0 => // flip one byte anywhere (incl. the size/geometry fields)
            val b = valid.clone(); b(pos % b.length) = junk; b
          case 1 => valid.take(pos % (valid.length + 1)) // truncate
          case _ => valid ++ Array.fill(1 + pos % 16)(junk) // trailing garbage
        }
        decodesOrRejects(kind, corrupt)
    }

  property("valid containers round-trip their closed-form geometry") =
    Prop.forAll(genText) { text =>
      val (w, h) = MediaGen.bmpDims(text.length)
      val wavFrames = math.max(1, (text.length + MediaCodec.WavWindow - 1) /
        MediaCodec.WavWindow)
      val img = MediaCodec.decode("image", MediaGen.bmp(text)) == ((w, h, 1))
      val aud = MediaCodec.decode("audio", MediaGen.wav(text)) ==
        ((0, 0, wavFrames))
      val vid = MediaCodec.decode("video", MediaGen.y4m(text)) ==
        ((MediaGen.Y4mWidth, MediaGen.Y4mHeight, 1 + text.length % 4))
      Prop(img && aud && vid) :| s"len=${text.length} img=$img aud=$aud vid=$vid"
    }

  property("per-frame features are an L1-normalized histogram (or empty)") =
    Prop.forAll(genText.flatMap(genValid)) { case (kind, payload) =>
      val (_, _, frames) = MediaCodec.decode(kind, payload)
      val ok = (0 until frames).forall { f =>
        val feat = MediaCodec.features(kind, payload, f, frames)
        val s = feat.sum
        feat.length == 8 && feat.forall(_ >= 0.0) &&
          (math.abs(s - 1.0) < 1e-9 || s == 0.0)
      }
      Prop(ok) :| s"$kind frames=$frames"
    }
}
