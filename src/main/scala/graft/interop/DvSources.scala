package graft.interop

import graft.functions.DvPositionSource
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.util.SerializableConfiguration

/** Executor-side deletion-vector blob loaders — the [[DvPositionSource]]
  * implementations behind [[graft.functions.DvDescriptorMap]]. Each is a
  * small Serializable descriptor (a path + byte range, never positions);
  * `positions()` runs on whichever executor first scans the covered file,
  * opening the filesystem from a [[SerializableConfiguration]] so the
  * load works identically on a driver-less task. None touch a
  * SparkSession. */
private[graft] object DvSources {

  private def fsFor(abs: String, conf: SerializableConfiguration): (FileSystem, HPath) = {
    val p = new HPath(abs)
    (p.getFileSystem(conf.value), p)
  }

  /** A Delta `storageType=i` inline vector: the z85-decoded bytes ride
    * in the descriptor itself (they came out of the log line — already
    * driver metadata), only the bitmap DECODE is deferred. */
  final case class Inline(bytes: Array[Byte], cardinality: Long) extends DvPositionSource {
    // content-addressed with a COLLISION-RESISTANT digest: this key
    // feeds the JVM-GLOBAL decode cache (and the changelog's
    // descriptor-set comparator) across every table sharing the
    // executor — a 32-bit hash collision between two distinct inline
    // vectors would silently serve the wrong deleted positions
    override val cacheKey: String = {
      val d = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      s"inline:${java.util.Base64.getEncoder.encodeToString(d)}#$cardinality"
    }
    override def positions(): Array[Long] = {
      val out = DeltaDv.deserialize(bytes)
      require(out.length.toLong == cardinality,
        s"DvSources: inline deletion vector decodes ${out.length} " +
          s"positions but declares cardinality $cardinality")
      out
    }
  }

  /** A Delta framed `.bin` region (`storageType` p/u, path resolved to
    * absolute driver-side). Verifies the descriptor's cardinality —
    * the same integrity require the old driver-side loader enforced. */
  final case class DeltaBlob(abs: String, offset: Int, sizeInBytes: Int,
      cardinality: Long, conf: SerializableConfiguration) extends DvPositionSource {
    override def cacheKey: String = s"delta:$abs@$offset+$sizeInBytes"
    override def positions(): Array[Long] = {
      val (fs, p) = fsFor(abs, conf)
      val out = DeltaDv.deserialize(DeltaDv.readBlob(fs, p, offset, sizeInBytes))
      require(out.length.toLong == cardinality,
        s"DvSources: deletion vector at $abs@$offset decodes ${out.length} " +
          s"positions but declares cardinality $cardinality")
      out
    }
  }

  /** An Iceberg v3 `deletion-vector-v1` puffin blob, located by the
    * manifest entry's content_offset / content_size_in_bytes. */
  final case class PuffinBlob(abs: String, offset: Long, length: Long,
      conf: SerializableConfiguration) extends DvPositionSource {
    override def cacheKey: String = s"puffin:$abs@$offset+$length"
    override def positions(): Array[Long] = {
      val (fs, p) = fsFor(abs, conf)
      Puffin.readDvBlob(fs, p, offset, length)
    }
  }

  /** One data file's positions out of an Iceberg v2 position-delete
    * PARQUET file: reads the delete file with the parquet-mr Group
    * reader (no SparkSession on a task) and keeps the rows whose
    * `file_path` names `targetRaw` (manifest-convention raw path,
    * normalized like the read planner normalizes data paths). A delete
    * file is spec-sorted by file_path, so the row-group stats bound the
    * scan; the decoded result is cached per executor by the enclosing
    * [[graft.functions.DvDescriptorMap]]. */
  final case class ParquetPosDeletes(deleteFileAbs: String, targetRaw: String,
      conf: SerializableConfiguration) extends DvPositionSource {
    override def cacheKey: String = s"pqdel:$deleteFileAbs#$targetRaw"
    override def positions(): Array[Long] = {
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
          new HPath(deleteFileAbs))
        .withConf(conf.value)
        .build()
      try {
        val acc = scala.collection.mutable.ArrayBuffer.empty[Long]
        var g = reader.read()
        while (g != null) {
          if (Hive.fsPathNoDecode(g.getString("file_path", 0)) == targetRaw)
            acc += g.getLong("pos", 0)
          g = reader.read()
        }
        acc.toArray
      } finally reader.close()
    }
  }

  /** The WILDCARD form of [[ParquetPosDeletes]] — the lazy
    * merge-on-read planner ships one of these per v2 position-delete
    * parquet (it cannot enumerate targets without the data-file
    * inventory; the targets live INSIDE the delete file); each probed
    * data file instantiates the keyed source on demand, whose cacheKey
    * is identical to the eager path's descriptor for the same
    * (delete file, target) pair — decode work is shared. */
  final case class WildcardPosDeletes(deleteFileAbs: String,
      conf: SerializableConfiguration,
      // the delete entry's file_path column bounds, when the writer
      // recorded them (spec reserved field 2147483546): a probed path
      // outside [pathLo, pathHi] is provably unreferenced — skip the
      // per-target scan entirely. Bounds may be spec-truncated
      // (lower truncated down, upper truncated-and-incremented up),
      // which only ever WIDENS the window, so the veto stays exact.
      pathLo: Option[String] = None, pathHi: Option[String] = None)
      extends graft.functions.WildcardDvSource {
    override def sourceFor(rawTargetPath: String): DvPositionSource =
      ParquetPosDeletes(deleteFileAbs, rawTargetPath, conf)
    override def mayApply(rawTargetPath: String): Boolean =
      boundsAdmit(rawTargetPath, pathLo, pathHi)
  }

  /** Spec bound comparison is byte-wise over UTF-8; JVM String order
    * is UTF-16 code-unit order. The two agree on ASCII — compare only
    * when everything involved is ASCII, else admit (never a wrong
    * skip, just a probe).
    *
    * The probe arrives scheme-stripped ([[Hive.fsPathNoDecode]] form,
    * `/tbl/data/f.parquet`), but external Iceberg writers commonly
    * record `file_path` — and therefore its column bounds — as full
    * URIs (`s3://…`, `file:/…`). Comparing those forms raw would put
    * every probe below the bound (`'/' < 's'`) and wrongly veto the
    * delete file, silently resurrecting deleted rows. So each bound is
    * brought into the probe's form first: textually strip a
    * `scheme:[//authority]` prefix (truncated bounds may chop inside
    * that prefix — then no path remains and the bound is dropped).
    * Dropping a bound only ever admits — the row-level probe itself
    * normalizes paths, so a spurious admit is just a probe, never a
    * wrong row. Stripping DISTINCT authorities is not order-preserving;
    * bounds that cross after stripping are incoherent in the stripped
    * domain and both are dropped. */
  private[interop] def boundsAdmit(path: String,
      lo: Option[String], hi: Option[String]): Boolean = {
    def ascii(s: String): Boolean = s.forall(_ < 128)
    if (!ascii(path) || !path.startsWith("/")) return true
    val schemePrefix = "^[A-Za-z][A-Za-z0-9+.\\-]*:(?://[^/]*)?(/.*)$".r
    def norm(b: String): Option[String] =
      if (!ascii(b)) None
      else if (b.startsWith("/")) Some(b)
      else b match {
        case schemePrefix(rest) => Some(rest)
        case _                  => None // truncated inside the prefix, or relative
      }
    val (loN, hiN) = (lo.flatMap(norm), hi.flatMap(norm))
    val coherent = (loN, hiN) match {
      case (Some(l), Some(h)) => l <= h
      case _                  => true
    }
    if (!coherent) return true
    val below = loN.exists(l => path < l)
    val above = hiN.exists(h => path > h)
    !below && !above
  }
}

/** Test seam for the deletion-vector scale contract: the MoR-delete
  * COMMIT paths collect O(touched files) descriptor rows to the driver
  * (never the matched positions), and the READ paths ship
  * descriptor-only filters. Each commit records how many rows its one
  * driver collect returned; specs assert it equals the touched-file
  * count for deletes of arbitrarily many rows. */
object DvIntrospect {
  /** Rows the last MoR-delete commit's driver collect returned —
    * descriptor rows, one per touched data file. */
  @volatile var lastCommitDriverRows: Int = -1
  /** Per-file descriptors in the last read-side DV filter built. */
  @volatile var lastReadDescriptors: Int = -1
  /** Descriptors the last changelog commit-step diff shipped (child +
    * parent sides over the touched files) — the changelog's own
    * driver-size bound: O(files), never the positions a commit
    * deleted. */
  @volatile var lastChangelogDiffDescriptors: Int = -1
}
