package graft.interop

import org.scalatest.funsuite.AnyFunSuite

class DeltaDvSpec extends AnyFunSuite {

  test("z85 locks the ZeroMQ spec vector and round-trips a uuid") {
    // the Z85 RFC's reference vector: 0x86 4F D2 6F B5 59 F7 5B <-> "HelloWorld"
    val helloBytes = Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B).map(_.toByte)
    assert(DeltaDv.z85Encode(helloBytes) == "HelloWorld")
    assert(DeltaDv.z85Decode("HelloWorld").toSeq == helloBytes.toSeq)
    val uuid = java.util.UUID.randomUUID()
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits); bb.putLong(uuid.getLeastSignificantBits)
    val enc = DeltaDv.z85Encode(bb.array())
    assert(enc.length == 20)
    assert(DeltaDv.z85Decode(enc).toSeq == bb.array().toSeq)
  }

  test("roaring round-trip across array, bitmap, multi-key, and multi-bitmap shapes") {
    val cases: Seq[Array[Long]] = Seq(
      Array.empty[Long],
      Array(0L),
      Array(5L, 7L, 9L, 65535L), // one array container
      (0L until 5000L).toArray, // dense -> bitmap container
      Array(1L, 70000L, 140000L, 1L << 20), // multiple 16-bit keys
      Array(3L, (1L << 32) + 17L, (3L << 32) + 5L), // multiple 32-bit bitmaps
      ((0L until 100L) ++ (4097L until 9000L) ++ Seq((1L << 32) | 65536L)).toArray,
    )
    cases.foreach { c =>
      val rt = DeltaDv.deserialize(DeltaDv.serialize(c))
      assert(rt.toSeq == c.distinct.sorted.toSeq, s"round-trip failed for ${c.take(5).toSeq}...")
    }
  }

  test("offset header points at the actual container data (foreign seek-path readers)") {
    // two containers (keys 0 and 1): layout is cookie(4) + count(4) +
    // descriptive(4*2) + offsets(4*2) = 24 bytes before container data
    val bytes = DeltaDv.serialize(Array(5L, 70000L))
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.position(4 + 8) // skip magic + bitmap count
    assert(buf.getInt() == 12347)
    assert(buf.getInt() == 2) // two containers
    buf.position(buf.position() + 8) // descriptive header
    val off0 = buf.getInt(); val off1 = buf.getInt()
    assert(off0 == 24, s"first container offset must be 24, got $off0")
    assert(off1 == 26, s"second container offset must be 26, got $off1")
    // the in-bitmap absolute position: offsets are relative to the
    // bitmap start (byte 12 of the array) — the value there must be
    // the container's first 16-bit value
    val bm = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert((bm.getShort(12 + off0) & 0xFFFF) == 5)
    assert((bm.getShort(12 + off1) & 0xFFFF) == (70000 & 0xFFFF))
  }

  test("deserializer reads run containers other writers emit") {
    // hand-craft one bitmap with the SERIAL_COOKIE run form: runs
    // [10,15] and [100,100] in key 0 -> stored as (10,5) and (100,0)
    val buf = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(DeltaDv.Magic)
    buf.putLong(1L) // one bitmap
    buf.putInt(12346 | (0 << 16)) // SERIAL_COOKIE, containerCount-1 = 0
    buf.put(1.toByte) // run flag bitset: container 0 is a run container
    buf.putShort(0.toShort) // key
    buf.putShort(6.toShort) // cardinality-1 (7 values)
    // < 4 containers with the run cookie -> NO offset header
    buf.putShort(2.toShort) // numRuns
    buf.putShort(10.toShort); buf.putShort(5.toShort) // 10..15
    buf.putShort(100.toShort); buf.putShort(0.toShort) // 100
    val bytes = java.util.Arrays.copyOf(buf.array(), buf.position())
    assert(DeltaDv.deserialize(bytes).toSeq == Seq(10L, 11L, 12L, 13L, 14L, 15L, 100L))
  }

  test("file framing: version byte, big-endian length, crc32 verified") {
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(conf)
    val dir = new org.apache.hadoop.fs.Path(
      System.getProperty("java.io.tmpdir"), s"graft_test/dv_${System.nanoTime()}")
    fs.mkdirs(dir)
    val f = new org.apache.hadoop.fs.Path(dir, "deletion_vector_test.bin")
    val b1 = DeltaDv.serialize(Array(1L, 2L, 3L))
    val b2 = DeltaDv.serialize(Array(42L))
    val offs = DeltaDv.writeFile(fs, f, Seq(b1, b2))
    assert(offs.head == (1, b1.length)) // first blob right after the version byte
    assert(DeltaDv.deserialize(
      DeltaDv.readBlob(fs, f, offs.head._1, offs.head._2)).toSeq == Seq(1L, 2L, 3L))
    assert(DeltaDv.deserialize(
      DeltaDv.readBlob(fs, f, offs(1)._1, offs(1)._2)).toSeq == Seq(42L))
    // a corrupted byte fails the checksum loudly
    val raw = {
      val in = fs.open(f)
      val len = fs.getFileStatus(f).getLen.toInt
      val a = new Array[Byte](len)
      in.readFully(0, a); in.close(); a
    }
    raw(6) = (raw(6) ^ 0xff).toByte
    val corrupted = new org.apache.hadoop.fs.Path(dir, "corrupt.bin")
    val out = fs.create(corrupted, true); out.write(raw); out.close()
    val e = intercept[IllegalArgumentException](
      DeltaDv.readBlob(fs, corrupted, offs.head._1, offs.head._2))
    assert(e.getMessage.contains("checksum") || e.getMessage.contains("declares"))
  }
}
