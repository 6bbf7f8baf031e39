package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Locks the murmur3 implementation to the Iceberg spec's PUBLISHED
  * hash vectors (spec Appendix B, "Bucket transform details") — a
  * foreign Iceberg reader prunes on these exact values, so any drift
  * is cross-engine corruption, not a style bug. */
class IcebergTransformsSpec extends AnyFunSuite {

  test("spec hash vectors: int/long widen to 8-byte little-endian") {
    assert(IcebergTransforms.hashLong(34L) == 2017239379)
  }

  test("spec hash vectors: date as days from epoch") {
    val days = java.time.LocalDate.parse("2017-11-16").toEpochDay
    assert(days == 17486L)
    assert(IcebergTransforms.hashLong(days) == -653330422)
  }

  test("spec hash vectors: timestamp as micros from epoch") {
    val micros = java.time.LocalDateTime.parse("2017-11-16T22:31:08")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    assert(IcebergTransforms.hashLong(micros) == -2047944441)
  }

  test("spec hash vectors: string as UTF-8 bytes") {
    assert(IcebergTransforms.murmur3("iceberg".getBytes("UTF-8")) == 1210000089)
  }

  test("spec hash vectors: binary verbatim") {
    assert(IcebergTransforms.murmur3(Array[Byte](0, 1, 2, 3)) == -188683207)
  }

  test("bucket is hash & Int.MaxValue mod N, non-negative for negative hashes") {
    // date vector hashes negative; bucket must still land in [0, N)
    val b = IcebergTransforms.bucketLong(17486L, 16)
    assert(b == ((-653330422 & Int.MaxValue) % 16) && b >= 0 && b < 16)
    assert(IcebergTransforms.bucketLong(34L, 16) == (2017239379 % 16))
  }
}
