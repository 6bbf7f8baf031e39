package graft.interop

import java.nio.file.{Files, Path, Paths}

/** Iceberg TABLE RELOCATION — rewrite every absolute self-reference in
  * a table's metadata so a byte-copied tree at a new root is a fully
  * self-contained table (the shape of Iceberg's own `rewrite_table_path`
  * disaster-recovery procedure: copy the tree, then rewrite the path
  * strings the metadata carries, because the spec records data-file and
  * manifest locations as absolute paths).
  *
  * What gets rewritten, mechanically:
  *  - the metadata dir's `v*.metadata.json` files — every textual JSON
  *    value that starts with the source root (`location`, snapshot
  *    `manifest-list`s, metadata-log entries, statistics paths);
  *  - its `.avro` files (manifest lists AND manifests) — every Avro
  *    string value that starts with the source root (`manifest_path`,
  *    `file_path`, `referenced_data_file`), recursing through records,
  *    arrays, maps, and unions;
  *  - the reserved `file_path` column-bounds entries (field id
  *    2147483546) inside `lower_bounds`/`upper_bounds` — these are
  *    BYTES holding UTF-8 paths, invisible to the string pass; left
  *    stale they would make the read planner's bounds veto
  *    ([[DvSources.boundsAdmit]]) compare old-root bounds against
  *    new-root probes and wrongly skip delete files.
  *
  * Everything else (data parquet, puffin DV blobs, version-hint) is a
  * raw byte copy: parquet data and puffin bitmaps carry no table paths.
  *
  * REFUSED: tables whose manifests reference delete-content entries
  * stored as PARQUET (v2 position-delete / equality-delete files) — a
  * delete parquet's `file_path` COLUMN names data files row-by-row
  * inside the parquet payload, and relocation does not rewrite data
  * bytes. v3 deletion vectors relocate fine (the puffin blob is
  * positional; its `referenced_data_file` pointer lives in the
  * manifest, which IS rewritten).
  *
  * Local-filesystem only (java.nio) — the production shape of this
  * operation is a distributed copy with the same per-file rewrite rules,
  * which at 100 TB is O(metadata) rewrite + O(data) dumb byte copy,
  * embarrassingly parallel per file.
  */
object IcebergRelocate {

  /** Copy the Iceberg table at `srcRoot` to `dstRoot` (must not
    * exist), rewriting all metadata self-references. */
  def relocate(srcRoot: String, dstRoot: String): Unit = {
    val src = Paths.get(srcRoot).toAbsolutePath.normalize()
    val dst = Paths.get(dstRoot).toAbsolutePath.normalize()
    require(Files.isDirectory(src.resolve("metadata")),
      s"relocate: $src is not an Iceberg table root (no metadata/ dir)")
    require(!Files.exists(dst), s"relocate: destination exists: $dst")
    val oldPrefix = src.toString
    val newPrefix = dst.toString
    val walk = Files.walk(src)
    try walk.forEach { f =>
      val to = dst.resolve(src.relativize(f))
      if (Files.isDirectory(f)) { Files.createDirectories(to): Unit }
      else if (f.getFileName.toString.endsWith(".crc")) {
        // Hadoop LocalFileSystem checksum sidecars: stale for every
        // rewritten file — drop them all; the local FS treats a missing
        // sidecar as "no checksum", never as an error
        (): Unit
      } else {
        Files.createDirectories(to.getParent)
        val name = f.getFileName.toString
        val inMetaDir = f.getParent.getFileName.toString == "metadata"
        if (inMetaDir && name.endsWith(".metadata.json"))
          Files.write(to, rewriteJson(Files.readAllBytes(f), oldPrefix, newPrefix)): Unit
        else if (inMetaDir && name.endsWith(".avro"))
          rewriteAvro(f, to, oldPrefix, newPrefix)
        else Files.copy(f, to): Unit
      }
    } finally walk.close()
  }

  // ------------------------------------------------------------ JSON

  private def rewriteJson(bytes: Array[Byte], from: String, to: String): Array[Byte] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(bytes)
    val out = rewriteNode(root, from, to)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(out)
  }

  private def rewriteNode(n: com.fasterxml.jackson.databind.JsonNode,
      from: String, to: String): com.fasterxml.jackson.databind.JsonNode = {
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
    n match {
      case t if t.isTextual && t.asText.startsWith(from) =>
        TextNode.valueOf(to + t.asText.stripPrefix(from))
      case o: ObjectNode =>
        val names = o.fieldNames()
        val keys = scala.collection.mutable.ArrayBuffer.empty[String]
        while (names.hasNext) keys += names.next()
        keys.foreach(k => o.set[com.fasterxml.jackson.databind.JsonNode](
          k, rewriteNode(o.get(k), from, to)))
        o
      case a: ArrayNode =>
        (0 until a.size()).foreach(i => a.set(i, rewriteNode(a.get(i), from, to)))
        a
      case other => other
    }
  }

  // ------------------------------------------------------------ Avro

  private def rewriteAvro(src: Path, dst: Path, from: String, to: String): Unit = {
    import org.apache.avro.file.{DataFileStream, DataFileWriter}
    import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
    val in = Files.newInputStream(src)
    val r = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try {
      val schema = r.getSchema
      val out = Files.newOutputStream(dst)
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      try {
        w.create(schema, out)
        while (r.hasNext) {
          val rec = r.next()
          w.append(rewriteValue(rec, from, to).asInstanceOf[GenericRecord])
        }
      } finally w.close()
    } finally r.close()
  }

  /** The reserved field id carrying `file_path` column bounds on
    * position-delete manifest entries (bytes, not strings). */
  private val PathBoundsKey = 2147483546

  private def rewriteValue(v: AnyRef, from: String, to: String): AnyRef = v match {
    case null => null
    case s: org.apache.avro.util.Utf8 =>
      val str = s.toString
      if (str.startsWith(from)) new org.apache.avro.util.Utf8(to + str.stripPrefix(from)) else s
    case s: String =>
      if (s.startsWith(from)) to + s.stripPrefix(from) else s
    case rec: org.apache.avro.generic.GenericRecord =>
      refuseDeleteParquet(rec)
      val fields = rec.getSchema.getFields
      val isBoundsKv = rec.getSchema.getField("key") != null &&
        rec.getSchema.getField("value") != null && fields.size() == 2
      if (isBoundsKv && (rec.get("key") match {
            case i: java.lang.Integer => i.intValue() == PathBoundsKey
            case l: java.lang.Long    => l.longValue() == PathBoundsKey.toLong
            case _                    => false
          })) {
        rec.get("value") match {
          case bb: java.nio.ByteBuffer =>
            val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
            val str = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
            if (str.startsWith(from))
              rec.put("value", java.nio.ByteBuffer.wrap(
                (to + str.stripPrefix(from)).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          case _ => ()
        }
        rec
      } else {
        fields.forEach { f =>
          rec.put(f.pos(), rewriteValue(rec.get(f.pos()), from, to))
        }
        rec
      }
    case arr: org.apache.avro.generic.GenericArray[_] =>
      val a = arr.asInstanceOf[org.apache.avro.generic.GenericArray[AnyRef]]
      (0 until a.size()).foreach(i => a.set(i, rewriteValue(a.get(i), from, to)))
      a
    case l: java.util.List[_] =>
      val a = l.asInstanceOf[java.util.List[AnyRef]]
      (0 until a.size()).foreach(i => a.set(i, rewriteValue(a.get(i), from, to)))
      a
    case m: java.util.Map[_, _] =>
      val mm = m.asInstanceOf[java.util.Map[AnyRef, AnyRef]]
      mm.entrySet().forEach(e => e.setValue(rewriteValue(e.getValue, from, to)))
      mm
    case other => other
  }

  /** A manifest entry whose delete content is a PARQUET file embeds
    * data-file paths in the parquet payload itself — not relocatable
    * by metadata rewrite alone. Detect on the nested `data_file`
    * record: content 1 (position deletes) or 2 (equality deletes) with
    * a `.parquet` path, vs content 1 with a puffin DV (relocatable). */
  private def refuseDeleteParquet(rec: org.apache.avro.generic.GenericRecord): Unit = {
    val s = rec.getSchema
    if (s.getField("content") != null && s.getField("file_path") != null) {
      val content = rec.get("content") match {
        case i: java.lang.Integer => i.intValue()
        case _                    => 0
      }
      val path = String.valueOf(rec.get("file_path"))
      if (content != 0 && path.endsWith(".parquet"))
        throw new IllegalStateException(
          s"relocate: table has a $path delete file stored as parquet — its file_path " +
            "COLUMN references data files inside the payload; compact the delete debt " +
            "(or use DV-based deletes) before relocating")
    }
  }
}
