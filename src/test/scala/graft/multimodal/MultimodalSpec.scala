package graft.multimodal

import graft.SparkFixture
import graft.multimodal.MultimodalOps.{MediaRecord, StubDecoder, extractFeatures}
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkFixture {

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
}
