package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** What a deletion-vector row filter probes: `(file, row position)` →
  * covered? Two implementations — [[DvMap]] carries fully-materialized
  * run lists (right when the position data already lives in driver
  * metadata, e.g. the native format's manifest-recorded runs), and
  * [[DvDescriptorMap]] carries only per-file blob DESCRIPTORS, loading
  * and decoding each file's bitmap lazily ON THE EXECUTOR that first
  * scans it — the driver never materializes a position. */
trait DvFilter extends Serializable {
  def contains(file: UTF8String, pos: Long): Boolean
}

private[functions] object DvFilter {
  val Empty: (Array[Long], Array[Long]) = (Array.emptyLongArray, Array.emptyLongArray)

  /** Strip a probing `_metadata.file_path` URI down to the map key:
    * URL-decode, then cut everything through the table-root marker. */
  def stripKey(file: UTF8String, marker: String): String = {
    val raw = file.toString
    val p =
      try new java.net.URI(raw).getPath
      catch { case _: java.net.URISyntaxException => raw }
    val i = p.indexOf(marker)
    if (i >= 0) p.substring(i + marker.length) else p
  }

  /** Last run with start <= pos over merged disjoint runs. */
  def covered(runs: (Array[Long], Array[Long]), pos: Long): Boolean = {
    val starts = runs._1
    if (starts.length == 0) false
    else {
      var lo = 0
      var hi = starts.length - 1
      var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (starts(mid) <= pos) { ans = mid; lo = mid + 1 } else hi = mid - 1
      }
      ans >= 0 && pos < runs._2(ans)
    }
  }

  /** Sorted (not necessarily distinct) positions → merged runs. */
  def positionsToRuns(sorted: Array[Long]): (Array[Long], Array[Long]) = {
    val starts = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ends = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < sorted.length) {
      val p = sorted(i)
      if (ends.nonEmpty && p <= ends.last) {
        if (p + 1 > ends.last) ends(ends.length - 1) = p + 1
      } else { starts += p; ends += p + 1 }
      i += 1
    }
    (starts.toArray, ends.toArray)
  }
}

/** One file's deletion bitmap, decodable on demand. Implementations
  * (inline bytes, a framed `.bin` region, a puffin blob) live with the
  * format codecs; they must be executor-serializable and must not
  * touch a SparkSession. */
trait DvPositionSource extends Serializable {
  /** Decode this source's deleted row positions — called lazily on the
    * first executor (or driver, in local mode) that probes the file. */
  def positions(): Array[Long]

  /** STABLE identity of the bytes this descriptor decodes — the
    * JVM-global decode-cache key (and the driver's descriptor-set
    * comparator). Must be equal across serialization round-trips and
    * must not lean on default `toString` (a captured Hadoop conf's
    * identity hash differs per deserialized task and would defeat the
    * cache). Blobs are immutable once committed, so equal keys imply
    * equal positions. */
  def cacheKey: String
}

/** A delete source that applies to ANY probed file: the lazy
  * merge-on-read planner's shape for delete files that name their
  * targets INTERNALLY (an Iceberg v2 position-delete parquet's
  * `file_path` column). The driver ships ONE wildcard per delete file
  * instead of one keyed descriptor per (delete file × data file) pair —
  * which would need the full data-file inventory, defeating lazy
  * manifest planning — and each scanning executor instantiates the
  * per-target source on first probe of a file (the instantiated
  * source's own cacheKey keeps decode work per (delete, file), shared
  * with the eager path's identical descriptors). */
trait WildcardDvSource extends Serializable {
  /** The concrete per-target source for one probed data file, given
    * its raw absolute path (the manifest-convention decoded form). */
  def sourceFor(rawTargetPath: String): DvPositionSource

  /** Whether this wildcard COULD reference `rawTargetPath` — a cheap,
    * metadata-only veto consulted before [[sourceFor]] (default:
    * always possible). An implementation backed by recorded target
    * bounds can skip the probe (and its IO) entirely for files the
    * delete cannot name; it must only ever veto paths that are
    * PROVABLY out of range. */
  def mayApply(rawTargetPath: String): Boolean = true
}

/** Descriptor-only deletion-vector filter: the serialized plan ships
  * per-file [[DvPositionSource]] descriptors — O(files-with-deletes)
  * driver/plan metadata no matter how many rows are deleted — and each
  * executor decodes only the bitmaps of the files it actually scans,
  * caching per JVM. The probe path after the first touch of a file is
  * identical to [[DvMap]]'s: thread-local file cache + binary search
  * over merged runs, inside whole-stage codegen. `wildcards` apply to
  * every probed file (see [[WildcardDvSource]]). */
final class DvDescriptorMap(
    marker: String,
    sources: Map[String, Seq[DvPositionSource]],
    wildcards: Seq[WildcardDvSource] = Nil) extends DvFilter {

  @transient private lazy val loaded =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]
  @transient private lazy val cache =
    new ThreadLocal[(UTF8String, (Array[Long], Array[Long]))]

  private def runsFor(key: String): (Array[Long], Array[Long]) = {
    val keyed = sources.getOrElse(key, Nil)
    // wildcards target by the raw absolute path (marker is the table
    // root prefix the probe key was stripped through); a wildcard
    // whose recorded target bounds cannot cover the path is vetoed
    // BEFORE any per-target source (and its IO) exists
    val ss =
      if (wildcards.isEmpty) keyed
      else {
        val raw = marker + key
        val applicable = wildcards.filter(_.mayApply(raw))
        if (applicable.size < wildcards.size)
          DvDescriptorMap.wildcardProbesSkipped.addAndGet(
            (wildcards.size - applicable.size).toLong): Unit
        keyed ++ applicable.map(_.sourceFor(raw))
      }
    if (ss.isEmpty) DvFilter.Empty
    else {
      loaded.add(key)
      // decode through the JVM-GLOBAL cache: filter instances are
      // per deserialized task, so an instance-local map would
      // re-decode every blob once per task (O(tasks × blobs) IO)
      DvDescriptorMap.getOrDecode(ss.map(_.cacheKey).sorted.mkString("|"), () => {
        val pos = ss.iterator.flatMap(_.positions().iterator).toArray
        java.util.Arrays.sort(pos)
        DvFilter.positionsToRuns(pos)
      })
    }
  }

  def contains(file: UTF8String, pos: Long): Boolean = {
    val c = cache.get()
    val hit =
      if (c != null && c._1.equals(file)) c._2
      else {
        val r = runsFor(DvFilter.stripKey(file, marker))
        cache.set((file.clone(), r))
        r
      }
    DvFilter.covered(hit, pos)
  }

  /** Files carrying descriptors (what a CDF before-image read scans). */
  def files: Set[String] = sources.keySet

  /** How many per-file descriptors the plan ships — the driver-side
    * size bound (test seam: O(files), never O(positions)). */
  def descriptorCount: Int = sources.size

  /** Wildcard delete sources shipped (test seam: O(delete files)). */
  def wildcardCount: Int = wildcards.size

  /** How many files' bitmaps THIS INSTANCE has resolved so far — 0
    * until an action actually scans a covered file (test seam for
    * laziness; the decoded runs themselves live in the JVM-global
    * cache). */
  def loadedCount: Int = loaded.size
}

object DvDescriptorMap {
  /** JVM-global decoded-runs cache, keyed by the per-file descriptor
    * identity ([[DvPositionSource.cacheKey]]) — shared across tasks,
    * scans, and filter instances. Soft values: a long-lived executor
    * sheds cold bitmaps under memory pressure instead of OOMing. */
  private val global = new java.util.concurrent.ConcurrentHashMap[
    String, java.lang.ref.SoftReference[(Array[Long], Array[Long])]]

  private[functions] def getOrDecode(key: String,
      decode: () => (Array[Long], Array[Long])): (Array[Long], Array[Long]) = {
    val ref = global.get(key)
    val hit = if (ref == null) null else ref.get()
    if (hit != null) hit
    else {
      val v = decode()
      global.put(key, new java.lang.ref.SoftReference(v))
      v
    }
  }

  /** Test seam: entries currently cached in this JVM. */
  def cachedEntries: Int = global.size

  /** JVM-global count of wildcard probes vetoed by
    * [[WildcardDvSource.mayApply]] bounds before any IO — the test
    * seam for the bounds-skip claim (executors each count their own;
    * in local mode this is the full figure). */
  val wildcardProbesSkipped = new java.util.concurrent.atomic.AtomicLong()
}

/** A [[DvFilter]] shipped by TORRENT BROADCAST instead of riding the
  * serialized plan: the task binary carries only the broadcast handle,
  * and the descriptor map moves once per executor — a table with ~1M
  * DV files would otherwise ship a multi-MB map inside every task. The
  * inner filter resolves lazily on first probe and is cached. */
final class BroadcastDvFilter(
    bc: org.apache.spark.broadcast.Broadcast[DvFilter]) extends DvFilter {
  @transient private lazy val inner: DvFilter = bc.value
  def contains(file: UTF8String, pos: Long): Boolean = inner.contains(file, pos)
}

/** CDC position diff as a FILTER: `(file, pos)` is newly covered when
  * the CHILD state's deletes cover it and the PARENT state's do not —
  * exactly the per-commit delete image a changelog emits for a
  * merge-on-read delete. Composed from two descriptor-only filters, so
  * the diff itself is computed task-side, per file, off lazily decoded
  * bitmaps (a per-file bitmap diff keyed by the probing scan — the
  * driver ships descriptors, never positions). */
final class DvDiff(child: DvFilter, parent: DvFilter) extends DvFilter {
  def contains(file: UTF8String, pos: Long): Boolean =
    child.contains(file, pos) && !parent.contains(file, pos)
}

/** POSITIONAL DELETION VECTOR lookup — the read half of the
  * merge-on-read delete story (Delta deletion vectors / Iceberg v3
  * position deletes, re-expressed as a Catalyst filter): instead of one
  * ANTI-JOIN per outstanding delete commit, the scan keeps every row
  * whose `(file, row position)` is not covered by a broadcast run-list.
  * O(log runs) binary search per row inside whole-stage codegen — no
  * shuffle, no build side, no join node in the read plan.
  *
  * The map is keyed by manifest-relative file paths; the probing
  * `_metadata.file_path` is a full URI, so [[DvMap.contains]] strips
  * everything through the table-root marker once per distinct file (a
  * per-thread one-entry cache keeps the hot path to a byte-compare —
  * rows arrive file-clustered, so the cache hits for entire scans).
  * Overlapping runs from independent delete commits are merged at
  * construction; a file absent from the map deletes nothing. */
final class DvMap private (
    marker: String,
    runs: Map[String, (Array[Long], Array[Long])]) extends DvFilter {

  @transient private lazy val cache =
    new ThreadLocal[(UTF8String, (Array[Long], Array[Long]))]

  def contains(file: UTF8String, pos: Long): Boolean = {
    val c = cache.get()
    val hit =
      if (c != null && c._1.equals(file)) c._2
      else {
        // the probe is Spark's URL-encoded `_metadata.file_path`; the
        // map keys are raw on-disk rel paths — decode before the marker
        // strip or a path Spark encodes (space in a partition value)
        // never matches and its deletes silently unapply. Once per
        // distinct file, not per row (the cache below).
        val raw = file.toString
        val p =
          try new java.net.URI(raw).getPath
          catch { case _: java.net.URISyntaxException => raw }
        val i = p.indexOf(marker)
        val key = if (i >= 0) p.substring(i + marker.length) else p
        val r = runs.getOrElse(key, DvMap.Empty)
        cache.set((file.clone(), r))
        r
      }
    val starts = hit._1
    if (starts.length == 0) false
    else {
      // last run with start <= pos (runs are merged+sorted → disjoint)
      var lo = 0
      var hi = starts.length - 1
      var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (starts(mid) <= pos) { ans = mid; lo = mid + 1 } else hi = mid - 1
      }
      ans >= 0 && pos < hit._2(ans)
    }
  }

  /** Rel paths this vector names (what the CDF before-image read scans). */
  def files: Set[String] = runs.keySet

  def totalPositions: Long = runs.valuesIterator.map { case (s, e) =>
    s.indices.iterator.map(i => e(i) - s(i)).sum
  }.sum
}

object DvMap {
  private val Empty = (Array.emptyLongArray, Array.emptyLongArray)

  /** Build from raw (relPath, start, len) runs, merging overlaps — two
    * delete commits may each cover the same position, and a binary
    * search over UNMERGED overlapping runs could miss coverage. */
  def apply(marker: String, raw: Seq[(String, Long, Long)]): DvMap = {
    val byFile = raw.groupBy(_._1).map { case (f, rs) =>
      val sorted = rs.map(r => (r._2, r._2 + r._3)).sortBy(_._1)
      val starts = scala.collection.mutable.ArrayBuffer.empty[Long]
      val ends = scala.collection.mutable.ArrayBuffer.empty[Long]
      for ((s, e) <- sorted) {
        if (ends.nonEmpty && s <= ends.last) {
          if (e > ends.last) ends(ends.length - 1) = e
        } else { starts += s; ends += e }
      }
      f -> (starts.toArray, ends.toArray)
    }
    new DvMap(marker, byFile)
  }
}

/** `dv_contains(file_path, row_index)` over a broadcast [[DvMap]] —
  * ships to executors inside the serialized plan (the map is
  * O(delete-debt runs), the same driver-size bound Delta's in-memory
  * DVs carry). Codegen-friendly: the generated code is one virtual
  * call on the referenced map, so the surrounding filter stays inside
  * WholeStageCodegen. */
case class DvContains(left: Expression, right: Expression, dv: DvFilter)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dv_contains expects (string file, bigint pos), got ($l, $r)")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_dv_contains"
  override def nullable: Boolean = false

  override def nullSafeEval(f: Any, p: Any): Any =
    dv.contains(f.asInstanceOf[UTF8String], p.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftDv", dv, classOf[DvFilter].getName)
    defineCodeGen(ctx, ev, (f, p) => s"$ref.contains($f, $p)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvContains =
    copy(left = newLeft, right = newRight)
}
