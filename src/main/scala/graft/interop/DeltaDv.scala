package graft.interop

/** Delta Lake DELETION VECTOR serialization, implemented from the
  * public protocol (PROTOCOL.md "Deletion Vectors") and the public
  * RoaringFormatSpec — no Delta or RoaringBitmap jar involved.
  *
  * A deletion vector is a RoaringBitmapArray in the "portable"
  * format: a 4-byte little-endian magic (1681511377), an 8-byte
  * little-endian count of 32-bit roaring bitmaps, then each bitmap in
  * the standard roaring portable serialization (cookie, per-container
  * keys/cardinalities, optional offsets, then array / bitmap / run
  * containers — all little-endian). A 64-bit row index maps to bitmap
  * `idx >>> 32` and 32-bit value `idx & 0xFFFFFFFF`.
  *
  * On disk ([[writeFile]] / [[readBlob]]): a 1-byte format version
  * (1), then each vector blob as a 4-byte BIG-endian length, the
  * bitmap bytes, and a 4-byte big-endian CRC-32 of those bytes — the
  * Java DataOutputStream framing the protocol describes. Inline
  * (`storageType="i"`) and UUID (`"u"`) descriptors use Z85 encoding
  * ([[z85Decode]]). The serializer only emits array and bitmap
  * containers (always legal); the deserializer additionally reads run
  * containers, which other writers may emit. */
object DeltaDv {

  val Magic = 1681511377

  // ------------------------------------------------------------ roaring

  /** Sorted distinct 64-bit positions → portable RoaringBitmapArray. */
  def serialize(positions: Array[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0), "DeltaDv: negative row index")
    val sorted = positions.distinct.sorted
    val nBitmaps = if (sorted.isEmpty) 0L else (sorted.last >>> 32) + 1
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >>> 8) }
    def w32(v: Int): Unit = { w16(v); w16(v >>> 16) }
    def w64(v: Long): Unit = { w32(v.toInt); w32((v >>> 32).toInt) }
    w32(Magic)
    w64(nBitmaps)
    var i = 0
    var bm = 0L
    while (bm < nBitmaps) {
      // slice this bitmap's 32-bit values
      val start = i
      while (i < sorted.length && (sorted(i) >>> 32) == bm) i += 1
      val vals = sorted.slice(start, i).map(v => (v & 0xFFFFFFFFL).toInt)
      // group by 16-bit key into containers
      val byKey = vals.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
      w32(12347) // SERIAL_COOKIE_NO_RUNCONTAINER
      w32(byKey.size)
      byKey.foreach { case (k, vs) => w16(k); w16(vs.length - 1) }
      // offset header (required with this cookie) — offsets are from
      // the bitmap's start: cookie(4) + count(4) + descriptive header
      // (4 bytes/container) + this offset header (4 bytes/container)
      var off = 4 + 4 + 4 * byKey.size + 4 * byKey.size
      byKey.foreach { case (_, vs) =>
        w32(off)
        off += (if (vs.length <= 4096) 2 * vs.length else 8192)
      }
      byKey.foreach { case (_, vs) =>
        if (vs.length <= 4096) vs.foreach(v => w16(v & 0xFFFF))
        else {
          val words = new Array[Long](1024)
          vs.foreach { v =>
            val low = v & 0xFFFF
            words(low >>> 6) |= (1L << (low & 63))
          }
          words.foreach(w64)
        }
      }
      bm += 1
    }
    out.toByteArray
  }

  /** Portable RoaringBitmapArray → sorted 64-bit positions. */
  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt() == Magic,
      s"DeltaDv: bad magic (not a portable RoaringBitmapArray)")
    val nBitmaps = buf.getLong()
    val acc = scala.collection.mutable.ArrayBuffer.empty[Long]
    var bm = 0L
    while (bm < nBitmaps) {
      val high = bm << 32
      val cookie = buf.getInt()
      val (nCont, runFlags) =
        if ((cookie & 0xFFFF) == 12346) { // SERIAL_COOKIE: run containers possible
          val n = (cookie >>> 16) + 1
          val flags = new Array[Byte]((n + 7) / 8)
          buf.get(flags)
          (n, Some(flags))
        } else if (cookie == 12347) {
          (buf.getInt(), None)
        } else throw new IllegalArgumentException(
          s"DeltaDv: unknown roaring cookie $cookie")
      def isRun(i: Int): Boolean =
        runFlags.exists(f => (f(i / 8) & (1 << (i % 8))) != 0)
      val keys = new Array[Int](nCont)
      val cards = new Array[Int](nCont)
      var i = 0
      while (i < nCont) {
        keys(i) = buf.getShort() & 0xFFFF
        cards(i) = (buf.getShort() & 0xFFFF) + 1
        i += 1
      }
      // offset header: present without run containers, or when >= 4
      // containers; sequential parsing just skips it
      if (runFlags.isEmpty || nCont >= 4) buf.position(buf.position() + 4 * nCont)
      i = 0
      while (i < nCont) {
        val base = high | (keys(i).toLong << 16)
        if (isRun(i)) {
          val nRuns = buf.getShort() & 0xFFFF
          var r = 0
          while (r < nRuns) {
            val start = buf.getShort() & 0xFFFF
            val len = buf.getShort() & 0xFFFF // inclusive extra values
            var v = start
            while (v <= start + len) { acc += (base | v); v += 1 }
            r += 1
          }
        } else if (cards(i) <= 4096) {
          var c = 0
          while (c < cards(i)) { acc += (base | (buf.getShort() & 0xFFFF)); c += 1 }
        } else {
          var w = 0
          while (w < 1024) {
            var word = buf.getLong()
            val wordBase = base | (w << 6)
            var b = 0
            while (word != 0L) {
              if ((word & 1L) != 0L) acc += (wordBase | b)
              word >>>= 1
              b += 1
            }
            w += 1
          }
        }
        i += 1
      }
      bm += 1
    }
    acc.toArray
  }

  // ----------------------------------------------------------- on-disk

  /** Append-style DV file: 1-byte version, then each blob framed as
    * big-endian length + data + big-endian CRC-32. Returns each blob's
    * descriptor offset (pointing AT its length field, what
    * `deletionVector.offset` records) and data size. */
  def writeFile(fs: org.apache.hadoop.fs.FileSystem, dest: org.apache.hadoop.fs.Path,
      blobs: Seq[Array[Byte]]): Seq[(Int, Int)] = {
    val out = fs.create(dest, true)
    val dos = new java.io.DataOutputStream(out)
    try {
      dos.writeByte(1)
      var offset = 1
      blobs.map { b =>
        val here = offset
        dos.writeInt(b.length)
        dos.write(b)
        val crc = new java.util.zip.CRC32()
        crc.update(b)
        dos.writeInt(crc.getValue.toInt)
        offset += 4 + b.length + 4
        (here, b.length)
      }
    } finally dos.close()
  }

  /** Read one DV blob at `offset` (its big-endian length field),
    * verifying size and checksum. */
  def readBlob(fs: org.apache.hadoop.fs.FileSystem, src: org.apache.hadoop.fs.Path,
      offset: Int, sizeInBytes: Int): Array[Byte] = {
    val in = fs.open(src)
    try {
      in.seek(offset.toLong)
      val din = new java.io.DataInputStream(in)
      val len = din.readInt()
      require(len == sizeInBytes,
        s"DeltaDv: $src@$offset declares $len bytes, descriptor says $sizeInBytes")
      val data = new Array[Byte](len)
      din.readFully(data)
      val expect = din.readInt()
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      require(crc.getValue.toInt == expect, s"DeltaDv: checksum mismatch in $src@$offset")
      data
    } finally in.close()
  }

  // --------------------------------------------------------------- z85

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decoder: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** ZeroMQ Z85: 5 chars → 4 bytes (the spec's test vector
    * "HelloWorld" is locked in DeltaDvSpec). */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"DeltaDv: z85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var acc = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j).toInt
        val v = if (c < 128) Z85Decoder(c) else -1
        require(v >= 0, s"DeltaDv: invalid z85 character '${s.charAt(i + j)}'")
        acc = acc * 85 + v
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (acc >>> 24).toByte
      out(o + 1) = (acc >>> 16).toByte
      out(o + 2) = (acc >>> 8).toByte
      out(o + 3) = acc.toByte
      i += 5
    }
    out
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"DeltaDv: z85 input length ${bytes.length} not a multiple of 4")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var acc = 0L
      var j = 0
      while (j < 4) { acc = (acc << 8) | (bytes(i + j) & 0xffL); j += 1 }
      val chunk = new Array[Char](5)
      var k = 4
      while (k >= 0) { chunk(k) = Z85Alphabet((acc % 85).toInt); acc /= 85; k -= 1 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  /** Resolve a `deletionVector` descriptor's `"u"` storage shape: an
    * optional random prefix followed by a 20-char z85 UUID →
    * `<prefix>/deletion_vector_<uuid>.bin` under the table root. */
  def uuidPath(tableRoot: org.apache.hadoop.fs.Path,
      pathOrInlineDv: String): org.apache.hadoop.fs.Path = {
    require(pathOrInlineDv.length >= 20, s"DeltaDv: uuid descriptor too short")
    val (prefix, enc) = pathOrInlineDv.splitAt(pathOrInlineDv.length - 20)
    val raw = z85Decode(enc)
    val bb = java.nio.ByteBuffer.wrap(raw)
    val uuid = new java.util.UUID(bb.getLong, bb.getLong)
    val name = s"deletion_vector_$uuid.bin"
    if (prefix.isEmpty) new org.apache.hadoop.fs.Path(tableRoot, name)
    else new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(tableRoot, prefix), name)
  }
}
