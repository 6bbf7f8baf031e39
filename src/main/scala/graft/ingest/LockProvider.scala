package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** The ONE storage primitive [[Versioned]]'s commit protocol needs that
  * is not plain read/write/list: atomically acquire the claim on a
  * version directory, exactly once across all concurrent writers.
  *
  * On HDFS and local filesystems, create-if-absent IS that primitive
  * ([[LocalExclusiveLock]]). Object stores differ: classic S3 had no
  * atomic create-if-absent — plain PUT overwrites silently, so a
  * file-based claim would let two writers both believe they won.
  * Modern strongly-consistent stores expose a CONDITIONAL PUT
  * (`If-None-Match`), and Delta ships pluggable LogStore/lock-client
  * implementations for exactly this seam. Extracting the trait makes
  * the swap a one-line deployment choice instead of a fork of the
  * commit protocol ([[ConditionalPutLock]] is the in-tree model of
  * such a store, race-tested by VersionedSpec).
  *
  * Contract:
  *  - [[tryAcquire]] returns true for EXACTLY ONE caller per dir until
  *    a matching [[release]] (mutual exclusion is the whole point);
  *  - the claim must leave a DURABLE trace ([[isHeld]] true in other
  *    processes) so crash arbitration ([[Versioned.recoverClaims]]) and
  *    rival-waiting ([[heldSinceMs]] age-gating) keep working;
  *  - [[release]] is idempotent and never throws on an absent claim.
  */
trait LockProvider {
  def tryAcquire(fs: FileSystem, dir: HPath): Boolean
  def release(fs: FileSystem, dir: HPath): Unit
  def isHeld(fs: FileSystem, dir: HPath): Boolean
  /** Epoch millis the held claim was acquired (None when not held) —
    * what age-gates crashed-writer recovery. */
  def heldSinceMs(fs: FileSystem, dir: HPath): Option[Long]
}

/** Default provider: the claim is a `_claim` marker created with
  * create-if-absent — atomic on local FS (`O_CREAT|O_EXCL` via NIO,
  * sidestepping Hadoop's LocalFileSystem non-atomic exists+create) and
  * on HDFS (namenode-arbitrated `create(overwrite=false)`). */
object LocalExclusiveLock extends LockProvider {
  private def claim(dir: HPath) = new HPath(dir, "_claim")

  override def tryAcquire(fs: FileSystem, dir: HPath): Boolean =
    if (fs.getUri.getScheme == "file")
      try {
        java.nio.file.Files.createFile(java.nio.file.Paths.get(claim(dir).toUri.getPath))
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    else
      try { fs.create(claim(dir), false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException        => false
      }

  override def release(fs: FileSystem, dir: HPath): Unit = {
    fs.delete(claim(dir), false): Unit
  }

  override def isHeld(fs: FileSystem, dir: HPath): Boolean = fs.exists(claim(dir))

  override def heldSinceMs(fs: FileSystem, dir: HPath): Option[Long] =
    if (fs.exists(claim(dir))) Some(fs.getFileStatus(claim(dir)).getModificationTime) else None
}

/** In-tree model of an object store WITHOUT atomic file creation but
  * WITH a server-side conditional PUT: the `_claim` marker is written
  * with `create(overwrite = true)` — deliberately the non-atomic
  * primitive, two racing writers would both "succeed" — and mutual
  * exclusion comes ONLY from the store-side compare-and-set
  * ([[putIfAbsent]] on a JVM-wide table standing in for the store's
  * `If-None-Match`). The table is process-scoped while the marker file
  * is durable, which models the crash story too: a restart clears the
  * table, the surviving marker is the crashed writer's trace, and
  * acquisition refuses until [[Versioned.recoverClaims]] arbitrates —
  * the same recovery path as the default provider. */
object ConditionalPutLock extends LockProvider {
  private def claim(dir: HPath) = new HPath(dir, "_claim")
  private val table = new java.util.concurrent.ConcurrentHashMap[String, Long]()
  private def key(fs: FileSystem, dir: HPath): String = claim(dir).toUri.toString

  override def tryAcquire(fs: FileSystem, dir: HPath): Boolean = {
    val k = key(fs, dir)
    if (table.putIfAbsent(k, System.currentTimeMillis()) != null) false
    else if (fs.exists(claim(dir))) {
      // durable marker from a crashed process: a real conditional PUT
      // would see the object present and refuse — roll the table entry
      // back so recovery (which deletes the marker) can free the slot
      table.remove(k)
      false
    } else {
      fs.create(claim(dir), true).close() // NON-atomic on purpose — see scaladoc
      // the durable marker now carries the mutual exclusion (every
      // later acquire — this process or another — sees it and
      // refuses); the table entry only had to close the CAS→create
      // window. Dropping it here keeps the JVM-wide table TRANSIENT:
      // without this, one entry leaked per committed version for the
      // process lifetime (no commit path ever calls release).
      table.remove(k)
      true
    }
  }

  override def release(fs: FileSystem, dir: HPath): Unit = {
    fs.delete(claim(dir), false)
    table.remove(key(fs, dir)): Unit
  }

  /** Observability for specs: entries currently mid-CAS. A healthy
    * process holds zero between commits — the table is transient. */
  private[ingest] def pendingClaims: Int = table.size

  override def isHeld(fs: FileSystem, dir: HPath): Boolean =
    table.containsKey(key(fs, dir)) || fs.exists(claim(dir))

  override def heldSinceMs(fs: FileSystem, dir: HPath): Option[Long] =
    Option(table.get(key(fs, dir)))
      .orElse(
        if (fs.exists(claim(dir))) Some(fs.getFileStatus(claim(dir)).getModificationTime)
        else None)
}
