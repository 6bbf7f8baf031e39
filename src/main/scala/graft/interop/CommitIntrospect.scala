package graft.interop

/** Observable counters for the interop writers' optimistic-concurrency
  * REBASE paths (same introspection spirit as [[DvIntrospect]]): each
  * successful lost-race rebase of a blind append increments its
  * format's counter. The graded contention entry `require`s a real
  * rebase happened; the race specs assert no silent lost update. */
object CommitIntrospect {
  val deltaRebases = new java.util.concurrent.atomic.AtomicLong(0L)
  val icebergRebases = new java.util.concurrent.atomic.AtomicLong(0L)
  // OCC level 2: lost-race rebases of MAINTENANCE rewrites (the
  // compaction-vs-ingest race) — a dataChange=false / `replace`
  // rewrite whose file-identity read set no rival touched
  val deltaRewriteRebases = new java.util.concurrent.atomic.AtomicLong(0L)
  val icebergRewriteRebases = new java.util.concurrent.atomic.AtomicLong(0L)
}

/** The one commit-arbitration primitive both interop writers share. */
object CommitFiles {

  /** Atomic CREATE-IF-ABSENT claim of `dest`, opened for writing.
    * On HDFS (and object stores with conditional PUT) the FileSystem's
    * own `create(f, overwrite = false)` is server-side atomic — but
    * Hadoop's LOCAL filesystem implements it as check-then-act, so two
    * simultaneous committers can BOTH pass the exists probe and the
    * second silently overwrites the first (a lost commit, observed
    * under 4-way append contention). On `file:` the claim therefore
    * goes through O_EXCL (`Files.createFile`), which the kernel
    * arbitrates. Losers get the same IOException the non-atomic path
    * produced, so every caller's ConcurrentModificationException
    * translation is unchanged. */
  def createExclusive(fs: org.apache.hadoop.fs.FileSystem,
      dest: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FSDataOutputStream =
    if (fs.getUri.getScheme == "file") {
      val p = java.nio.file.Paths.get(dest.toUri.getPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      try java.nio.file.Files.createFile(p)
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          // the TYPED exists-failure (it extends IOException, so every
          // caller's ConcurrentModificationException translation still
          // fires) — callers distinguishing a lost race from a genuine
          // IO failure (disk full, permissions) match on this type
          val ex = new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"$dest already exists")
          ex.initCause(e)
          throw ex
      }
      // the claim is ours; open it for the payload (truncating our own
      // zero-byte claim, never a rival's — they failed above)
      fs.create(dest, true)
    } else fs.create(dest, false)
}
