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
  *    arrays, maps, and unions. Bound forms handled beyond the plain
  *    prefix: `scheme:[//authority]` + source-root strings (external
  *    writers record `file:/…` / `s3://…` URIs — the r16 lesson from
  *    [[DvSources.boundsAdmit]]) rewrite their PATH part, keeping the
  *    scheme;
  *  - the reserved `file_path` column-bounds entries (field id
  *    2147483546) inside `lower_bounds`/`upper_bounds` — these are
  *    BYTES holding UTF-8 paths, invisible to the string pass; left
  *    stale they would make the read planner's bounds veto
  *    ([[DvSources.boundsAdmit]]) compare old-root bounds against
  *    new-root probes and wrongly skip delete files;
  *  - every manifest-list entry's `manifest_length` — rewriting a
  *    manifest changes its byte length (each embedded path grows or
  *    shrinks by the prefix delta), and spec-compliant readers open
  *    manifests WITH the recorded length (truncated tail blocks =
  *    silently dropped data files), so manifests rewrite FIRST and the
  *    list entries are patched with the real new lengths.
  *
  * Avro files are re-encoded preserving the source file's header
  * metadata (externally written manifests carry required keys like
  * `schema`/`partition-spec`/`format-version`) and its codec (a
  * gzip-compressed manifest stays compressed).
  *
  * Everything else (data parquet, puffin DV blobs, version-hint) is a
  * raw byte copy: parquet data and puffin bitmaps carry no table paths.
  *
  * After the copy, the whole metadata tree is re-scanned for any raw
  * occurrence of the source root and the relocation FAILS if one
  * remains (a copy that still points home is silently lost with the
  * home region — fail loud, never serve a half-relocated table).
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
    // nested roots make the prefix rewrite and the self-containment
    // scan ill-defined (dst paths would legitimately contain src)
    require(!(newPrefix + "/").startsWith(oldPrefix + "/") &&
      !(oldPrefix + "/").startsWith(newPrefix + "/"),
      s"relocate: source and destination must not nest ($src vs $dst)")

    // a refused or failed relocation must not leave a half-written
    // copy behind — it would read as a (broken) table
    try relocateInto(src, dst, oldPrefix, newPrefix)
    catch {
      case t: Throwable =>
        graft.ingest.Writers.deleteTree(dst); throw t
    }
  }

  private def relocateInto(src: Path, dst: Path,
      oldPrefix: String, newPrefix: String): Unit = {
    // pass 1: copy the tree verbatim, deferring the metadata rewrites;
    // Hadoop LocalFileSystem .crc sidecars are dropped everywhere (they
    // would be stale for every rewritten file; a missing sidecar means
    // "no checksum", never an error)
    val jsons = scala.collection.mutable.ArrayBuffer.empty[(Path, Path)]
    val avros = scala.collection.mutable.ArrayBuffer.empty[(Path, Path)]
    val walk = Files.walk(src)
    try walk.forEach { f =>
      val to = dst.resolve(src.relativize(f))
      if (Files.isDirectory(f)) { Files.createDirectories(to): Unit }
      else if (f.getFileName.toString.endsWith(".crc")) { (): Unit }
      else {
        Files.createDirectories(to.getParent)
        val name = f.getFileName.toString
        val inMetaDir = f.getParent.getFileName.toString == "metadata"
        if (inMetaDir && name.endsWith(".metadata.json")) jsons += ((f, to))
        else if (inMetaDir && name.endsWith(".avro")) avros += ((f, to))
        else Files.copy(f, to): Unit
      }
    } finally walk.close()

    // pass 2: plain MANIFESTS first, recording each rewritten file's
    // NEW length under its NEW absolute path — the lengths the list
    // entries must carry
    val (listFiles, manifestFiles) = avros.partition { case (f, _) => isManifestList(f) }
    val newLengths = scala.collection.mutable.Map.empty[String, Long]
    manifestFiles.foreach { case (f, to) =>
      rewriteAvro(f, to, oldPrefix, newPrefix, Map.empty)
      newLengths(to.toString) = Files.size(to)
    }
    // pass 3: manifest LISTS, patching manifest_length from the map
    listFiles.foreach { case (f, to) =>
      rewriteAvro(f, to, oldPrefix, newPrefix, newLengths.toMap)
    }
    // pass 4: metadata JSON
    jsons.foreach { case (f, to) =>
      Files.write(to, rewriteJson(Files.readAllBytes(f), oldPrefix, newPrefix)): Unit
    }
    // pass 5: the DR guarantee — not one metadata byte still points home
    val stale = mentions(dst.resolve("metadata"), oldPrefix)
    if (stale > 0)
      throw new IllegalStateException(
        s"relocate: $stale metadata files of the copy still reference $src — " +
          "a self-reference survived the rewrite (unsupported path form?); " +
          "the copy would be lost with the source")
  }

  /** Count the metadata files under `dir` whose raw bytes reference
    * the path `needle` AT A PATH BOUNDARY — the self-containment probe
    * (paths live as plain UTF-8 in both the JSON and Avro containers,
    * so a raw scan finds any stale reference regardless of format).
    * The boundary matters: a sibling table whose name extends the
    * source's (`ti` vs `ti_dr`) contains the source string in every
    * one of its own paths without referencing the source. Shared by
    * the relocation's own final check, the s74 in-entry require, and
    * the spec. */
  def mentions(dir: Path, needle: String): Long = {
    val boundary = (java.util.regex.Pattern.quote(needle) + "(?![A-Za-z0-9_.\\-])").r
    val walk = Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.filter(Files.isRegularFile(_)).count { f =>
        boundary.findFirstIn(new String(Files.readAllBytes(f),
          java.nio.charset.StandardCharsets.ISO_8859_1)).isDefined
      }
    } finally walk.close()
  }

  /** A manifest LIST carries `manifest_file` records (field
    * `manifest_path`); a plain manifest carries `manifest_entry`
    * records (field `data_file`). */
  private def isManifestList(f: Path): Boolean = {
    import org.apache.avro.file.DataFileStream
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val in = Files.newInputStream(f)
    val r = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try r.getSchema.getField("manifest_path") != null
    finally r.close()
  }

  // ------------------------------------------------------------ string

  private val SchemePrefixed = "^([A-Za-z][A-Za-z0-9+.\\-]*:(?://[^/]*)?)(/.*)$".r

  /** Rewrite `s` if it is a self-reference in either recorded form:
    * the raw root-prefixed path, or a `scheme:[//authority]` URI whose
    * path part is root-prefixed (external writers' convention) — the
    * scheme/authority is preserved, only the path re-roots. The match
    * is PATH-BOUNDARY-aware: `from` must be the whole string or be
    * followed by `/` — a sibling table named `<src>_dr` must never
    * have its paths captured by `<src>`'s rewrite. */
  private def rootPrefixed(s: String, from: String): Boolean =
    s == from || s.startsWith(from + "/")

  private def rewriteString(s: String, from: String, to: String): Option[String] =
    if (rootPrefixed(s, from)) Some(to + s.stripPrefix(from))
    else s match {
      case SchemePrefixed(prefix, rest) if rootPrefixed(rest, from) =>
        Some(prefix + to + rest.stripPrefix(from))
      case _ => None
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
      case t if t.isTextual =>
        rewriteString(t.asText, from, to).map(TextNode.valueOf).getOrElse(t)
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

  /** Avro header metadata keys the writer owns — everything else
    * (schema/partition-spec/format-version/content …) copies verbatim
    * so externally written manifests keep their required keys. */
  private val ReservedAvroMeta = Set("avro.schema", "avro.codec")

  private def rewriteAvro(src: Path, dst: Path, from: String, to: String,
      manifestLengths: Map[String, Long]): Unit = {
    import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
    import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
    val in = Files.newInputStream(src)
    val r = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try {
      val schema = r.getSchema
      val out = Files.newOutputStream(dst)
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      try {
        // preserve header metadata + codec BEFORE create (required
        // keys for external readers; compressed files stay compressed)
        r.getMetaKeys.forEach { k =>
          if (!ReservedAvroMeta.contains(k)) w.setMeta(k, r.getMeta(k)): Unit
        }
        Option(r.getMetaString("avro.codec")).filter(_ != "null")
          .foreach(c => w.setCodec(CodecFactory.fromString(c)): Unit)
        w.create(schema, out)
        while (r.hasNext) {
          val rec = rewriteValue(r.next(), from, to).asInstanceOf[GenericRecord]
          // a manifest-list entry: the referenced manifest was already
          // rewritten — record its REAL new length (spec readers open
          // manifests with the recorded length; a stale one truncates)
          if (rec.getSchema.getField("manifest_path") != null &&
              rec.getSchema.getField("manifest_length") != null) {
            val p = String.valueOf(rec.get("manifest_path"))
            val local = Hive.fsPathNoDecode(p)
            manifestLengths.get(local).foreach(len =>
              rec.put("manifest_length", java.lang.Long.valueOf(len)))
          }
          w.append(rec)
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
      rewriteString(s.toString, from, to)
        .map(new org.apache.avro.util.Utf8(_)).getOrElse(s)
    case s: String =>
      rewriteString(s, from, to).getOrElse(s)
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
            rewriteString(str, from, to).foreach(nv =>
              rec.put("value", java.nio.ByteBuffer.wrap(
                nv.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
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
