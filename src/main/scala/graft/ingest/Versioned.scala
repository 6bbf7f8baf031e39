package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Snapshot-versioned parquet table — the transactional-table semantics
  * (snapshot isolation, time travel, MERGE, retention) the rewrite family
  * in [[Writers]] cannot give: its tmp+rename-aside swap leaves a window
  * in which a concurrent reader sees the dataset mid-swap (r4 verdict,
  * "What's missing" #1). Delta/Iceberg jars do not exist in this
  * environment (SURVEY §7.5 G6), so this implements the core of their
  * commit protocol directly on `org.apache.hadoop.fs`:
  *
  *  - Every commit writes a brand-new IMMUTABLE version directory
  *    `v{N}/data/`; existing versions are never touched.
  *  - `_claim` is created FIRST with atomic create-if-absent — two racing
  *    writers cannot both own a version; the loser advances to N+1 and
  *    retries (same role as Delta's optimistic log-entry rename).
  *  - `_committed` is created LAST: its atomic appearance IS the commit.
  *    A reader either sees it (whole snapshot visible) or doesn't (the
  *    version does not exist yet) — there is no intermediate state, so
  *    concurrent readers NEVER observe a partial table.
  *  - Readers resolve `current = max committed version` once, at
  *    DataFrame construction, and pin that directory: a commit that lands
  *    mid-query changes nothing for them (snapshot isolation), and
  *    `readAt` gives time travel to any retained version.
  *  - [[vacuum]] is the retention knob: drops all but the last K
  *    committed versions plus any crashed (claimed-but-uncommitted)
  *    attempts below the current version.
  *
  * Scale notes: the protocol costs one directory listing per resolve
  * (O(retained versions), bounded by vacuum) and zero renames of data
  * files. On HDFS, create-if-absent and file visibility are atomic; on
  * strongly-consistent object stores (S3 today) visibility holds and the
  * claim needs a conditional PUT — the one primitive a production port
  * swaps in. Each MERGE rewrites the full snapshot (like the swap
  * family); a partitioned variant would rewrite only touched partitions
  * under the same marker protocol.
  */
object Versioned {

  private val ClaimFile = "_claim"
  private val CommittedFile = "_committed"

  private def versionDir(root: HPath, v: Long) = new HPath(root, f"v$v%05d")
  private def dataDir(root: HPath, v: Long) = new HPath(versionDir(root, v), "data")

  private def parseVersion(name: String): Option[Long] =
    if (name.length >= 6 && name.head == 'v' && name.tail.forall(_.isDigit))
      Some(name.tail.toLong)
    else None

  private def isCommitted(fs: FileSystem, root: HPath, v: Long): Boolean =
    fs.exists(new HPath(versionDir(root, v), CommittedFile))

  /** All committed versions, ascending. Crashed attempts (claimed but
    * never committed) are invisible here by construction. */
  def versions(path: String): Seq[Long] = {
    val (fs, root) = Writers.fsFor(path)
    if (!fs.exists(root)) Nil
    else
      fs.listStatus(root).toSeq
        .flatMap(st => parseVersion(st.getPath.getName))
        .filter(v => isCommitted(fs, root, v))
        .sorted
  }

  def currentVersion(path: String): Option[Long] = versions(path).lastOption

  /** Pin and read one committed snapshot (time travel). Fails loudly for
    * a version that was vacuumed or never committed — silently reading an
    * adjacent snapshot would be a wrong-answer class. */
  def readAt(spark: SparkSession, path: String, version: Long): DataFrame = {
    val (fs, root) = Writers.fsFor(path)
    require(isCommitted(fs, root, version),
      s"Versioned.readAt: version $version of $path is not committed (never existed, crashed, or vacuumed)")
    spark.read.parquet(dataDir(root, version).toString)
  }

  /** Read the current snapshot. The version is resolved HERE, so the
    * returned frame keeps reading this snapshot even if commits land
    * while the query runs. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val v = currentVersion(path).getOrElse(
      throw new IllegalArgumentException(s"Versioned.read: no committed version under $path"))
    readAt(spark, path, v)
  }

  /** Commit `df` as the next version; returns the version number.
    * Safe under concurrent committers (claim race → retry at N+1) and
    * crashes (an unclaimed `_committed` never appears, so a half-written
    * attempt is invisible to every reader). */
  def commit(df: DataFrame, path: String): Long = {
    val (fs, root) = Writers.fsFor(path)
    fs.mkdirs(root)
    var v = currentVersion(path).getOrElse(0L) + 1
    var claimed = false
    while (!claimed) {
      val dir = versionDir(root, v)
      fs.mkdirs(dir)
      try {
        // atomic create-if-absent: exactly one writer owns version v
        fs.create(new HPath(dir, ClaimFile), false).close()
        claimed = true
      } catch { case _: java.io.IOException => v += 1 }
    }
    df.write.mode(SaveMode.Overwrite).parquet(dataDir(root, v).toString)
    // the LAST step: the marker's atomic appearance is the commit point
    fs.create(new HPath(versionDir(root, v), CommittedFile), false).close()
    v
  }

  /** MERGE: replace rows matching `key` in the current snapshot with
    * `updates`, append the rest, commit as a new version. History stays
    * readable via [[readAt]] until vacuumed. */
  def upsert(spark: SparkSession, path: String, updates: DataFrame, key: String): Long = {
    Writers.requireUniqueKeys("Versioned.upsert", updates, key)
    val merged = read(spark, path)
      .join(updates, Seq(key), "left_anti")
      .unionByName(updates)
    commit(merged, path)
  }

  /** Retention: keep the newest `keepLast` committed versions, delete
    * everything older — including crashed (claimed, never committed)
    * attempts below the current version, which are garbage by
    * definition. Returns the number of version directories removed. */
  def vacuum(path: String, keepLast: Int): Int = {
    require(keepLast >= 1, s"vacuum must keep at least 1 version, got $keepLast")
    val (fs, root) = Writers.fsFor(path)
    if (!fs.exists(root)) return 0
    val committed = versions(path)
    val keep = committed.takeRight(keepLast).toSet
    val current = committed.lastOption.getOrElse(0L)
    val all = fs.listStatus(root).toSeq.flatMap(st => parseVersion(st.getPath.getName))
    val doomed = all.filter(v => !keep.contains(v) && v < current)
    doomed.foreach(v => fs.delete(versionDir(root, v), true))
    doomed.size
  }
}
