package graft.multimodal

import graft.SparkFixture
import graft.multimodal.MultimodalOps.{resize, sampleFrames, extractFeatures, decodeImages, MediaRecord, Png, StubDecoder}
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkFixture {

  test("Png round-trip: decoded dimensions and pixel sum equal the closed form") {
    for (id <- Seq(0L, 7L, 199L); (w, h) <- Seq((8, 8), (12, 8), (1, 1))) {
      val bytes = Png.render(id, w, h)
      // a real PNG container, not a raw dump
      assert(bytes.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
      val dec = Png.decode(bytes)
      val expected = (for (y <- 0 until h; x <- 0 until w) yield (id * 31 + x * 7 + y * 13) % 256).sum
      assert(dec.width == w && dec.height == h, s"dims for id=$id")
      assert(dec.graySum == expected, s"pixel sum for id=$id ${w}x$h")
    }
  }

  test("Png.decode rejects non-image payloads loudly") {
    intercept[IllegalArgumentException](Png.decode("not a png".getBytes("UTF-8")))
  }

  test("decodeImages runs the real decoder distributed and keeps byte lengths") {
    import spark.implicits._
    val in = Seq(
      MediaRecord(1L, Png.render(1L, 10, 8), "image/png", 0, 0),
      MediaRecord(2L, Png.render(2L, 8, 8), "image/png", 0, 0),
    ).toDS().repartition(2)
    val out = decodeImages(in).collect().sortBy(_.doc_id)
    assert(out.map(f => (f.doc_id, f.width, f.height)).toSeq == Seq((1L, 10, 8), (2L, 8, 8)))
    assert(out.forall(f => f.byte_len > 0 && f.gray_sum > 0))
  }

  test("StubDecoder is deterministic and byte-driven") {
    assert(StubDecoder.decode(Array.emptyByteArray) == 0.0)
    assert(StubDecoder.decode(Array[Byte](10, 20, 30)) == 20.0)
    assert(StubDecoder.decode(Array[Byte](-1)) == 255.0) // unsigned view
  }

  test("extractFeatures preserves schema and computes per-row features") {
    import spark.implicits._
    val in = Seq(
      MediaRecord(1L, "abc".getBytes("UTF-8"), "image/png", 640, 480),
      MediaRecord(2L, Array.emptyByteArray, "audio/wav", 0, 0),
    ).toDS()
    val out = extractFeatures(in).collect().sortBy(_.doc_id)
    assert(out.length == 2)
    assert(out(0).byte_len == 3 && out(0).head_byte == 'a'.toInt)
    assert(out(0).gray_mean == ('a'.toInt + 'b'.toInt + 'c'.toInt) / 3.0)
    assert(out(1).byte_len == 0 && out(1).head_byte == 0 && out(1).gray_mean == 0.0)
  }

  test("resize rewrites metadata and passes the payload through untouched") {
    import spark.implicits._
    val in = Seq(MediaRecord(1L, "payload".getBytes("UTF-8"), "image/png", 640, 480)).toDS()
    val out = resize(in, 320, 240).collect().head
    assert(out.width == 320 && out.height == 240)
    assert(new String(out.payload, "UTF-8") == "payload")
  }

  test("sampleFrames emits every n-th frame with correct tail-frame length") {
    import spark.implicits._
    // 250 bytes at 100 bytes/frame -> frames 0(100), 1(100), 2(50); every
    // 2nd -> indices 0 and 2, tail frame is the 50-byte partial
    val in = Seq(MediaRecord(1L, Array.fill[Byte](250)(7), "video/mp4", 0, 0)).toDS()
    val frames = sampleFrames(in, frameBytes = 100, everyNth = 2).collect().sortBy(_.frame_idx)
    assert(frames.map(f => (f.frame_idx, f.frame_len)).toSeq == Seq((0, 100L), (2, 50L)))
    // empty payload -> no frames, not a crash
    val empty = Seq(MediaRecord(2L, Array.emptyByteArray, "video/mp4", 0, 0)).toDS()
    assert(sampleFrames(empty, 100, 2).count() == 0)
    // degenerate strides fail fast at call time, not inside a task
    intercept[IllegalArgumentException](sampleFrames(empty, 0, 2))
    intercept[IllegalArgumentException](sampleFrames(empty, 100, 0))
  }

  test("Wav chunk walk honors RIFF word padding and rejects truncated chunks") {
    import graft.multimodal.MultimodalOps.Wav
    val plain = Wav.render(7L, 50)
    val expected = Wav.decode(plain)
    // splice an ODD-sized LIST/INFO-style chunk between WAVE and fmt:
    // 8-byte header + 3 payload bytes + 1 pad byte (NOT in the size)
    val chunk = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    chunk.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put("abc".getBytes("US-ASCII")).put(0.toByte)
    val spliced = plain.take(12) ++ chunk.array() ++ plain.drop(12)
    assert(Wav.decode(spliced) == expected,
      "an odd-sized chunk must not misalign the walk")
    // a chunk whose declared size exceeds the container fails loudly
    val truncated = spliced.take(12 + 8 + 2)
    intercept[IllegalArgumentException](Wav.decode(truncated))
  }

  test("Wav tolerates a missing final pad byte and rejects undersized fmt chunks") {
    import graft.multimodal.MultimodalOps.Wav
    val plain = Wav.render(7L, 50)
    val expected = Wav.decode(plain)
    val oddTail = java.nio.ByteBuffer.allocate(11)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    oddTail.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put("abc".getBytes("US-ASCII")) // 3 payload bytes, NO pad
    // trailing junk after the data chunk is ignored (decode returns at
    // data; this does NOT exercise the pad clamp — the cases below do)
    assert(Wav.decode(plain ++ oddTail.array()) == expected)
    // THE CLAMP CASES: the walk must cross an unpadded odd chunk that
    // is the FINAL chunk without running past the buffer limit.
    // (a) odd chunk directly after the RIFF header, nothing follows
    val headerOnly = plain.take(12) ++ oddTail.array()
    val e = intercept[IllegalArgumentException](Wav.decode(headerOnly))
    assert(e.getMessage.contains("no data chunk"),
      s"the clamp must walk to a clean end, not overrun: ${e.getMessage}")
    // (b) odd chunk after a parsed fmt chunk, nothing follows — the
    // walk crosses fmt first, then clamps on the trailing odd chunk
    val fmtLen = 12 + 8 + 16 // RIFF header + fmt header + PCM fmt payload
    val fmtThenOdd = plain.take(fmtLen) ++ oddTail.array()
    val e2 = intercept[IllegalArgumentException](Wav.decode(fmtThenOdd))
    assert(e2.getMessage.contains("no data chunk"),
      s"clamp after fmt must also end cleanly: ${e2.getMessage}")
    // fmt chunk declaring < 16 bytes must fail, not walk backwards
    val badFmt = java.nio.ByteBuffer.allocate(12 + 8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    badFmt.put("RIFF".getBytes("US-ASCII")).putInt(16)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(4).putInt(0)
    val e3 = intercept[IllegalArgumentException](Wav.decode(badFmt.array()))
    assert(e3.getMessage.contains("need >= 16"))
  }
}
