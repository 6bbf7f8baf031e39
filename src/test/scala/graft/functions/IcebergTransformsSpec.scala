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

  // ---- codegen lock --------------------------------------------------
  // Round-8 verdict: doGenCode emitted `IcebergTransforms.MODULE$`, which
  // Janino cannot compile (MODULE$ lives on the IcebergTransforms$ class,
  // not the mirror), so every bucket transform silently ran interpreted.
  // These tests compile the generated code DIRECTLY — no fallback path
  // exists through GenerateUnsafeProjection.generate, so a codegen bug is
  // a test failure, not a log warning.

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.BoundReference
  import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType, TimestampType}
  import org.apache.spark.unsafe.types.UTF8String

  test("codegen lock: generated projection compiles and matches interpreted eval (long)") {
    val expr = IcebergBucket(BoundReference(0, LongType, nullable = true), 16)
    val proj = GenerateUnsafeProjection.generate(Seq(expr)) // throws on Janino failure
    val row = proj(InternalRow(34L))
    assert(row.getInt(0) == expr.eval(InternalRow(34L)).asInstanceOf[Int])
    assert(row.getInt(0) == (2017239379 % 16))
  }

  test("codegen lock: string input") {
    val expr = IcebergBucket(BoundReference(0, StringType, nullable = true), 32)
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    val in = InternalRow(UTF8String.fromString("iceberg"))
    assert(proj(in).getInt(0) == ((1210000089 & Int.MaxValue) % 32))
    assert(proj(in).getInt(0) == expr.eval(in).asInstanceOf[Int])
  }

  test("codegen lock: int widens to long before hashing") {
    val expr = IcebergBucket(BoundReference(0, IntegerType, nullable = true), 16)
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    assert(proj(InternalRow(34)).getInt(0) == (2017239379 % 16))
  }

  test("codegen lock: null propagates, timestamp micros path") {
    val expr = IcebergBucket(BoundReference(0, TimestampType, nullable = true), 16)
    val proj = GenerateUnsafeProjection.generate(Seq(expr))
    assert(proj(InternalRow(null)).isNullAt(0))
    val micros = java.time.LocalDateTime.parse("2017-11-16T22:31:08")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    assert(proj(InternalRow(micros)).getInt(0) == ((-2047944441 & Int.MaxValue) % 16))
  }
}
