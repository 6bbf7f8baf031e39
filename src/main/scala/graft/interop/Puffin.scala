package graft.interop

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** PUFFIN file format, implemented from the published Apache Iceberg
  * Puffin spec (puffin-spec.md) — the container Iceberg v3 stores
  * deletion vectors in. No Iceberg jar involved.
  *
  * File layout: `Magic Blob1 ... BlobN Footer`, where Footer =
  * `Magic FooterPayload FooterPayloadSize Flags Magic`:
  *   - Magic: the 4 bytes 0x50 0x46 0x41 0x31 ("PFA1")
  *   - FooterPayload: UTF-8 JSON `{"blobs": [...], "properties": {...}}`
  *   - FooterPayloadSize: 4-byte little-endian byte length of the payload
  *   - Flags: 4 reserved bytes; bit 0 of byte 0 set means the payload is
  *     LZ4 FRAME compressed — read transparently via the lz4-java Spark
  *     ships (this module always writes uncompressed, which is legal)
  *
  * Each blob-metadata object carries `type`, `fields`, `snapshot-id`,
  * `sequence-number`, `offset`, `length`, optional `compression-codec`
  * (absent = uncompressed) and `properties`.
  *
  * DELETION VECTOR blobs (`type = "deletion-vector-v1"`, the v3 spec's
  * "Deletion vectors" section) frame their payload as:
  *   - the combined length of the magic and vector, 4 bytes big-endian
  *   - the 4-byte magic sequence D1 D3 39 64 (the little-endian encoding
  *     of 1681511377 — the same magic Delta's DV files use)
  *   - the position vector in the portable 64-bit RoaringBitmapArray
  *     serialization (shared with Delta — [[DeltaDv.serialize]] emits
  *     exactly `magic + vector`, so this module reuses that codec)
  *   - a CRC-32 checksum of the magic and vector, 4 bytes big-endian
  * and must set properties `referenced-data-file` (the exact data-file
  * path the DV applies to) and `cardinality` (set-bit count). The spec
  * requires one DV blob per referenced data file; `snapshot-id` and
  * `sequence-number` are stamped -1 at write time (the commit that will
  * adopt the file has not happened yet) — readers resolve applicability
  * from the MANIFEST entry, never from blob metadata. */
object Puffin {

  private val Magic: Array[Byte] = Array(0x50, 0x46, 0x41, 0x31).map(_.toByte)

  private lazy val Json = new com.fasterxml.jackson.databind.ObjectMapper()

  /** One footer blob-metadata record. `offset`/`length` locate the blob
    * bytes in the file — for a DV blob they are exactly what the v3
    * manifest entry's `content_offset`/`content_size_in_bytes` record. */
  final case class BlobMeta(
      blobType: String, offset: Long, length: Long,
      snapshotId: Long, sequenceNumber: Long,
      compressionCodec: Option[String], properties: Map[String, String],
      fields: Seq[Int] = Nil)

  /** Write a Puffin file holding one deletion-vector blob per entry of
    * `dvs` (referenced data-file path → sorted deleted row positions).
    * Returns each blob's (referencedDataFile, offset, length,
    * cardinality) in input order — what the caller records in the
    * delete manifest. */
  def writeDvFile(fs: FileSystem, dest: HPath,
      dvs: Seq[(String, Array[Long])]): Seq[(String, Long, Long, Long)] = {
    require(dvs.nonEmpty, "Puffin.writeDvFile: no deletion vectors to write")
    val out = fs.create(dest, false)
    try {
      out.write(Magic)
      var offset = Magic.length.toLong
      val blobsJson = Json.createArrayNode()
      val refs = dvs.map { case (refFile, positions) =>
        require(positions.nonEmpty,
          s"Puffin.writeDvFile: empty deletion vector for $refFile")
        val vector = DeltaDv.serialize(positions) // magic + portable bitmaps
        val crc = new java.util.zip.CRC32()
        crc.update(vector)
        val bb = java.nio.ByteBuffer.allocate(4 + vector.length + 4)
          .order(java.nio.ByteOrder.BIG_ENDIAN)
        bb.putInt(vector.length).put(vector).putInt(crc.getValue.toInt)
        val blob = bb.array()
        out.write(blob)
        val here = offset
        offset += blob.length
        val m = blobsJson.addObject()
        m.put("type", "deletion-vector-v1")
        m.putArray("fields")
        m.put("snapshot-id", -1L)
        m.put("sequence-number", -1L)
        m.put("offset", here)
        m.put("length", blob.length.toLong)
        val props = m.putObject("properties")
        props.put("referenced-data-file", refFile)
        props.put("cardinality", positions.distinct.length.toString)
        (refFile, here, blob.length.toLong, positions.distinct.length.toLong)
      }
      val payloadNode = Json.createObjectNode()
      payloadNode.set[com.fasterxml.jackson.databind.JsonNode]("blobs", blobsJson)
      payloadNode.putObject("properties").put("created-by", "graft")
      val payload = Json.writeValueAsString(payloadNode).getBytes("UTF-8")
      out.write(Magic)
      out.write(payload)
      val tail = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payload.length)
      tail.putInt(0) // flags: uncompressed footer
      out.write(tail.array())
      out.write(Magic)
      refs
    } finally out.close()
  }

  /** One blob to land in a stats file: the spec's blob-metadata fields
    * plus the payload bytes (already serialized — e.g. a compact theta
    * sketch). */
  final case class StatBlob(blobType: String, fields: Seq[Int],
      snapshotId: Long, sequenceNumber: Long, bytes: Array[Byte],
      properties: Map[String, String])

  /** Write a GENERIC Puffin file (the `statistics` container ANALYZE
    * publishes — same framing as the DV writer above, but arbitrary
    * blob types, spec field-ids lists, and raw payloads). Returns
    * (file size, footer payload size) — the `file-size-in-bytes` /
    * `file-footer-size-in-bytes` the table metadata's statistics
    * entry records. */
  def writeStatsFile(fs: FileSystem, dest: HPath,
      blobs: Seq[StatBlob]): (Long, Long) = {
    require(blobs.nonEmpty, "Puffin.writeStatsFile: no blobs to write")
    val out = fs.create(dest, true)
    val footerPayloadSize = try {
      out.write(Magic)
      var offset = Magic.length.toLong
      val blobsJson = Json.createArrayNode()
      blobs.foreach { b =>
        out.write(b.bytes)
        val m = blobsJson.addObject()
        m.put("type", b.blobType)
        val fieldsArr = m.putArray("fields")
        b.fields.foreach(f => fieldsArr.add(f): Unit)
        m.put("snapshot-id", b.snapshotId)
        m.put("sequence-number", b.sequenceNumber)
        m.put("offset", offset)
        m.put("length", b.bytes.length.toLong)
        val props = m.putObject("properties")
        b.properties.foreach { case (k, v) => props.put(k, v): Unit }
        offset += b.bytes.length
      }
      val payloadNode = Json.createObjectNode()
      payloadNode.set[com.fasterxml.jackson.databind.JsonNode]("blobs", blobsJson)
      payloadNode.putObject("properties").put("created-by", "graft")
      val payload = Json.writeValueAsString(payloadNode).getBytes("UTF-8")
      out.write(Magic)
      out.write(payload)
      val tail = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payload.length)
      tail.putInt(0) // flags: uncompressed footer
      out.write(tail.array())
      out.write(Magic)
      payload.length.toLong
    } finally out.close()
    (fs.getFileStatus(dest).getLen, footerPayloadSize)
  }

  /** Raw blob bytes at (`offset`, `length`) — what a stats reader hands
    * the sketch library when the ndv property is absent. */
  def readBlobBytes(fs: FileSystem, src: HPath, offset: Long, length: Long): Array[Byte] = {
    val in = fs.open(src)
    try {
      val buf = new Array[Byte](length.toInt)
      in.readFully(offset, buf)
      buf
    } finally in.close()
  }

  /** Parse a Puffin footer: all blob metadata plus the file properties.
    * LZ4-frame-compressed payloads decompress transparently; malformed
    * magic refuses loudly. */
  def readFooter(fs: FileSystem, src: HPath): (Seq[BlobMeta], Map[String, String]) = {
    val len = fs.getFileStatus(src).getLen
    require(len >= 2L * Magic.length + 12,
      s"Puffin: $src is too short (${len} bytes) to be a Puffin file")
    val in = fs.open(src)
    try {
      val head = new Array[Byte](4)
      in.readFully(0L, head)
      require(head.sameElements(Magic), s"Puffin: $src does not start with PFA1")
      val tail = new Array[Byte](12) // payloadSize(4) + flags(4) + magic(4)
      in.readFully(len - 12, tail)
      require(tail.slice(8, 12).sameElements(Magic),
        s"Puffin: $src does not end with PFA1")
      val bb = java.nio.ByteBuffer.wrap(tail).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val payloadSize = bb.getInt()
      val flags = bb.getInt()
      require(payloadSize >= 2 && len >= 12L + payloadSize + 2 * Magic.length,
        s"Puffin: $src footer payload size $payloadSize is inconsistent")
      val payload = new Array[Byte](payloadSize)
      in.readFully(len - 12 - payloadSize, payload)
      val preMagic = new Array[Byte](4)
      in.readFully(len - 12 - payloadSize - 4, preMagic)
      require(preMagic.sameElements(Magic),
        s"Puffin: $src footer does not begin with PFA1")
      // flag bit 0: the payload is LZ4 FRAME compressed (spec) —
      // decompressed with the lz4-java Spark already ships
      val payloadBytes =
        if ((flags & 1) == 0) payload
        else {
          val lz4 = new net.jpountz.lz4.LZ4FrameInputStream(
            new java.io.ByteArrayInputStream(payload))
          try {
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var n = lz4.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = lz4.read(buf) }
            out.toByteArray
          } finally lz4.close()
        }
      val node = Json.readTree(new String(payloadBytes, "UTF-8"))
      val blobs = Option(node.get("blobs")).toSeq.flatMap { arr =>
        (0 until arr.size()).map { i =>
          val b = arr.get(i)
          val props = Option(b.get("properties")).filter(_.isObject).map { p =>
            val m = scala.collection.mutable.Map.empty[String, String]
            p.properties().forEach(e => m += e.getKey -> e.getValue.asText())
            m.toMap
          }.getOrElse(Map.empty[String, String])
          val fids = Option(b.get("fields")).filter(_.isArray).map { arr2 =>
            (0 until arr2.size()).map(j => arr2.get(j).asInt)
          }.getOrElse(Seq.empty)
          BlobMeta(
            b.get("type").asText,
            b.get("offset").asLong,
            b.get("length").asLong,
            Option(b.get("snapshot-id")).map(_.asLong).getOrElse(-1L),
            Option(b.get("sequence-number")).map(_.asLong).getOrElse(-1L),
            Option(b.get("compression-codec")).filterNot(_.isNull).map(_.asText),
            props, fids)
        }
      }
      val fileProps = Option(node.get("properties")).filter(_.isObject).map { p =>
        val m = scala.collection.mutable.Map.empty[String, String]
        p.properties().forEach(e => m += e.getKey -> e.getValue.asText())
        m.toMap
      }.getOrElse(Map.empty[String, String])
      (blobs, fileProps)
    } finally in.close()
  }

  /** Read one deletion-vector blob at (`offset`, `length`) — the values
    * the v3 manifest entry records — verifying the framing length, the
    * DV magic, and the CRC-32. Returns the sorted deleted positions. */
  def readDvBlob(fs: FileSystem, src: HPath, offset: Long, length: Long): Array[Long] = {
    require(length >= 12, s"Puffin: DV blob at $src@$offset is too short ($length bytes)")
    val in = fs.open(src)
    try {
      val blob = new Array[Byte](length.toInt)
      in.readFully(offset, blob)
      val bb = java.nio.ByteBuffer.wrap(blob).order(java.nio.ByteOrder.BIG_ENDIAN)
      val vectorLen = bb.getInt()
      require(vectorLen + 8 == length,
        s"Puffin: DV blob at $src@$offset declares $vectorLen vector bytes, " +
          s"blob length is $length (want vector + 8)")
      val vector = new Array[Byte](vectorLen)
      bb.get(vector)
      val expect = bb.getInt()
      val crc = new java.util.zip.CRC32()
      crc.update(vector)
      require(crc.getValue.toInt == expect,
        s"Puffin: DV blob checksum mismatch at $src@$offset")
      // DeltaDv.deserialize validates the leading D1 D3 39 64 magic
      DeltaDv.deserialize(vector)
    } finally in.close()
  }
}
