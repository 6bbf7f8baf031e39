package graft.interop

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.scalatest.funsuite.AnyFunSuite

/** The Puffin container + deletion-vector-v1 blob framing, locked
  * byte-level: magic at both ends, little-endian footer payload size,
  * compression-flag refusal, CRC verification, and the DV blob's
  * big-endian length / D1 D3 39 64 magic / portable-roaring layout
  * shared with [[DeltaDv]]. */
class PuffinSpec extends AnyFunSuite {

  private def localFs = FileSystem.getLocal(new Configuration()).getRaw

  private def tmpFile(name: String): HPath = {
    val dir = java.nio.file.Files.createTempDirectory("puffin").toString
    new HPath(dir, name)
  }

  test("DV file round-trips positions through footer and blob reads") {
    val fs = localFs
    val dest = tmpFile("dv.puffin")
    val a = Array(0L, 1L, 5L, 4096L, (1L << 32) + 7L)
    val b = Array(42L)
    val refs = Puffin.writeDvFile(fs, dest,
      Seq("/data/f1.parquet" -> a, "/data/f2.parquet" -> b))
    assert(refs.map(_._1) == Seq("/data/f1.parquet", "/data/f2.parquet"))
    assert(refs.forall(_._2 >= 4), "blobs start after the leading magic")
    assert(refs.head._4 == a.length && refs.last._4 == b.length)
    // the manifest-recorded (offset, length) is all a reader needs
    assert(Puffin.readDvBlob(fs, dest, refs.head._2, refs.head._3).toSeq == a.sorted.toSeq)
    assert(Puffin.readDvBlob(fs, dest, refs.last._2, refs.last._3).toSeq == b.toSeq)
    // the footer agrees with the returned refs and carries the spec's
    // DV properties
    val (blobs, props) = Puffin.readFooter(fs, dest)
    assert(props.get("created-by").contains("graft"))
    assert(blobs.map(m => (m.blobType, m.offset, m.length)) ==
      refs.map(r => ("deletion-vector-v1", r._2, r._3)))
    assert(blobs.head.properties("referenced-data-file") == "/data/f1.parquet")
    assert(blobs.head.properties("cardinality") == a.length.toString)
    assert(blobs.forall(_.compressionCodec.isEmpty))
  }

  test("file layout: PFA1 magic leads, trails, and precedes the footer payload") {
    val fs = localFs
    val dest = tmpFile("layout.puffin")
    Puffin.writeDvFile(fs, dest, Seq("/f.parquet" -> Array(3L)))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dest.toUri.getPath))
    val magic = "PFA1".getBytes("UTF-8")
    assert(bytes.slice(0, 4).sameElements(magic))
    assert(bytes.slice(bytes.length - 4, bytes.length).sameElements(magic))
    val sizeBB = java.nio.ByteBuffer.wrap(bytes, bytes.length - 12, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val payloadSize = sizeBB.getInt()
    val payloadStart = bytes.length - 12 - payloadSize
    assert(bytes.slice(payloadStart - 4, payloadStart).sameElements(magic))
    val payload = new String(bytes.slice(payloadStart, payloadStart + payloadSize), "UTF-8")
    assert(payload.contains("\"deletion-vector-v1\""))
    // the DV blob itself: BE length + D1 D3 39 64 + vector + BE crc
    val blobOff = 4
    val vecLen = java.nio.ByteBuffer.wrap(bytes, blobOff, 4).getInt()
    assert(bytes.slice(blobOff + 4, blobOff + 8)
      .sameElements(Array(0xD1, 0xD3, 0x39, 0x64).map(_.toByte)))
    val crc = new java.util.zip.CRC32()
    crc.update(bytes, blobOff + 4, vecLen)
    val want = java.nio.ByteBuffer.wrap(bytes, blobOff + 4 + vecLen, 4).getInt()
    assert(crc.getValue.toInt == want)
  }

  test("an LZ4-frame-compressed footer reads transparently") {
    val fs = localFs
    val dest = tmpFile("dv_lz4.puffin")
    val refs = Puffin.writeDvFile(fs, dest, Seq("/f.parquet" -> Array(1L, 5L)))
    val p = java.nio.file.Paths.get(dest.toUri.getPath)
    val bytes = java.nio.file.Files.readAllBytes(p)
    val size = java.nio.ByteBuffer.wrap(bytes, bytes.length - 12, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt()
    val payloadStart = bytes.length - 12 - size
    val payload = bytes.slice(payloadStart, payloadStart + size)
    val baos = new java.io.ByteArrayOutputStream()
    val z = new net.jpountz.lz4.LZ4FrameOutputStream(baos)
    z.write(payload); z.close()
    val comp = baos.toByteArray
    val tailBB = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tailBB.putInt(comp.length).putInt(1) // flags: compressed footer
    val rebuilt = bytes.slice(0, payloadStart) ++ comp ++ tailBB.array() ++
      "PFA1".getBytes("UTF-8")
    java.nio.file.Files.write(p, rebuilt)
    val (blobs, props) = Puffin.readFooter(fs, dest)
    assert(props.get("created-by").contains("graft"))
    assert(blobs.map(b => (b.blobType, b.offset, b.length)) ==
      refs.map(r => ("deletion-vector-v1", r._2, r._3)))
    assert(Puffin.readDvBlob(fs, dest, refs.head._2, refs.head._3).toSeq == Seq(1L, 5L))
  }

  test("corruption and unsupported shapes refuse loudly") {
    val fs = localFs
    val dest = tmpFile("bad.puffin")
    val refs = Puffin.writeDvFile(fs, dest, Seq("/f.parquet" -> Array(1L, 2L)))
    val p = java.nio.file.Paths.get(dest.toUri.getPath)
    val bytes = java.nio.file.Files.readAllBytes(p)
    // flip one bitmap byte inside the blob -> CRC mismatch
    val corrupt = bytes.clone()
    corrupt(refs.head._2.toInt + 10) = (corrupt(refs.head._2.toInt + 10) ^ 0x5A).toByte
    java.nio.file.Files.write(p, corrupt)
    val e1 = intercept[IllegalArgumentException](
      Puffin.readDvBlob(fs, dest, refs.head._2, refs.head._3))
    assert(e1.getMessage.contains("checksum") || e1.getMessage.contains("magic"))
    // the compression flag over a NON-lz4 payload fails loudly (frame
    // magic mismatch), never misparses
    val flagged = bytes.clone()
    flagged(flagged.length - 8) = (flagged(flagged.length - 8) | 1).toByte
    java.nio.file.Files.write(p, flagged)
    intercept[Exception](Puffin.readFooter(fs, dest))
    // truncate the trailing magic -> not a puffin file
    java.nio.file.Files.write(p, bytes.dropRight(2))
    intercept[IllegalArgumentException](Puffin.readFooter(fs, dest))
    // wrong declared length -> framing refusal
    java.nio.file.Files.write(p, bytes)
    intercept[IllegalArgumentException](
      Puffin.readDvBlob(fs, dest, refs.head._2, refs.head._3 + 1))
  }
}
