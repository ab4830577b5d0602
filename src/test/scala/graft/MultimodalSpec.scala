package graft

import graft.Multimodal.{MediaCodec, MediaGen}

/** The media codec must parse REAL container headers: every dimension /
  * frame count the decode reports has to come out of the bytes, not the
  * generator's arithmetic. */
class MultimodalSpec extends SparkSpec {

  test("BMP: generated header round-trips through the LE32 field parse") {
    val text = "hello bitmap world".getBytes("UTF-8")
    val payload = MediaGen.bmp(text)
    val (w, h) = MediaGen.bmpDims(text.length)
    assert(payload(0) == 'B' && payload(1) == 'M')
    assert(MediaCodec.decode("image", payload) == ((w, h, 1)))
    assert(payload.length == 54 + 3 * w * h)
  }

  test("WAV: RIFF chunk walk finds the data chunk; windows derive from sample count") {
    val text = Array.fill(4500)('x'.toByte) // 4500 samples = 3 windows of 2000
    val payload = MediaGen.wav(text)
    assert(MediaCodec.decode("audio", payload) == ((0, 0, 3)))
    assert(payload.length == 44 + 2 * 4500)
    // exact-multiple boundary: 4000 samples fill 2 windows exactly — no
    // phantom empty trailing window (ceil semantics, not 1 + floor)
    assert(MediaCodec.decode("audio",
      MediaGen.wav(Array.fill(4000)('x'.toByte))) == ((0, 0, 2)))
    // empty audio still decodes: zero-length data chunk, one (empty) window
    assert(MediaCodec.decode("audio", MediaGen.wav(Array.empty)) == ((0, 0, 1)))
  }

  test("y4m: geometry parsed from the text header, frames counted by marker walk") {
    val text = "abcdefg".getBytes("UTF-8") // len 7 -> 1 + 7%4 = 4 frames
    val payload = MediaGen.y4m(text)
    assert(MediaCodec.decode("video", payload) ==
      ((MediaGen.Y4mWidth, MediaGen.Y4mHeight, 4)))
    assert(payload.length == 32 + 4 * (6 + MediaGen.Y4mFrameBytes))
  }

  test("malformed payloads are rejected, not fabricated") {
    val junk = "definitely not a container".getBytes("UTF-8")
    intercept[IllegalArgumentException](MediaCodec.decode("image", junk))
    intercept[IllegalArgumentException](MediaCodec.decode("audio", junk))
    intercept[IllegalArgumentException](MediaCodec.decode("video", junk))
  }

  test("per-frame features cover disjoint data regions of the real payload") {
    // a WAV whose first window is all one byte and second all another:
    // the per-window histograms must differ, proving the feature reads
    // the frame's own sample range rather than the whole payload
    val text = Array.fill(2000)(0.toByte) ++ Array.fill(2000)(255.toByte)
    val payload = MediaGen.wav(text)
    val f0 = MediaCodec.features("audio", payload, 0, 2)
    val f1 = MediaCodec.features("audio", payload, 1, 2)
    assert(math.abs(f0.sum - 1.0) < 1e-9)
    assert(math.abs(f1.sum - 1.0) < 1e-9)
    assert(!f0.sameElements(f1))
  }
}
