package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Iceberg spec's partition-transform value functions (spec
  * Appendix B), implemented from the published algorithm — no Iceberg
  * jar involved. `bucket[N]` is `(murmur3_x86_32(encode(v)) &
  * Int.MaxValue) % N` where int/long/date/timestamp encode as the
  * value WIDENED TO LONG in 8-byte little-endian and strings as their
  * UTF-8 bytes. The spec's published vectors (hash(34L) = 2017239379,
  * hash("iceberg") = 1210000089, …) are locked in
  * IcebergTransformsSpec. */
object IcebergTransforms {

  /** Standard murmur3_x86_32 over `bytes` with seed 0 (the spec pins
    * the seed). */
  def murmur3(bytes: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = bytes.length
    var h1 = 0 // seed
    val nblocks = len / 4
    var i = 0
    while (i < nblocks) {
      val base = i * 4
      var k1 = (bytes(base) & 0xff) | ((bytes(base + 1) & 0xff) << 8) |
        ((bytes(base + 2) & 0xff) << 16) | ((bytes(base + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    // tail
    var k1 = 0
    val tail = nblocks * 4
    (len & 3) match {
      case 3 =>
        k1 ^= (bytes(tail + 2) & 0xff) << 16
        k1 ^= (bytes(tail + 1) & 0xff) << 8
        k1 ^= bytes(tail) & 0xff
      case 2 =>
        k1 ^= (bytes(tail + 1) & 0xff) << 8
        k1 ^= bytes(tail) & 0xff
      case 1 =>
        k1 ^= bytes(tail) & 0xff
      case _ => ()
    }
    if ((len & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    // fmix
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** int/long/date/timestamp hash: the value widened to long, 8-byte
    * little-endian. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    murmur3(b)
  }

  def bucketLong(v: Long, n: Int): Int = (hashLong(v) & Int.MaxValue) % n

  def bucketBytes(bytes: Array[Byte], n: Int): Int = (murmur3(bytes) & Int.MaxValue) % n

  def bucketUTF8(s: UTF8String, n: Int): Int = bucketBytes(s.getBytes, n)
}

/** `graft_iceberg_bucket(col)` — the bucket[N] transform as a codegen
  * Catalyst expression over int/long/date/timestamp(-ntz)/string
  * columns, used to derive the staging partition column at write time
  * (one virtual call per row inside WholeStageCodegen; no UDF). */
case class IcebergBucket(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"graft_iceberg_bucket: bucket count must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: IntegerType | _: LongType | _: DateType | _: TimestampType |
        _: TimestampNTZType | _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_iceberg_bucket does not support input type $other")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_iceberg_bucket"

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case _: StringType => IcebergTransforms.bucketUTF8(v.asInstanceOf[UTF8String], n)
    case _: IntegerType | _: DateType => IcebergTransforms.bucketLong(v.asInstanceOf[Int].toLong, n)
    case _ => IcebergTransforms.bucketLong(v.asInstanceOf[Long], n)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Call the object's static forwarders (on the mirror class) — the same
    // pattern as NfcNormalize. `IcebergTransforms.MODULE$` is NOT valid
    // Janino: the MODULE$ field lives on the `IcebergTransforms$` class,
    // and referencing it through the mirror class fails compilation and
    // silently demotes every bucket transform to interpreted eval.
    val obj = "graft.functions.IcebergTransforms"
    child.dataType match {
      case _: StringType =>
        defineCodeGen(ctx, ev, c => s"$obj.bucketUTF8($c, $n)")
      case _ =>
        defineCodeGen(ctx, ev, c => s"$obj.bucketLong((long) $c, $n)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): IcebergBucket =
    copy(child = newChild)
}
