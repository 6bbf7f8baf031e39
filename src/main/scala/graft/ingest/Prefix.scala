package graft.ingest

/** Session-cached IMMUTABLE producer fixtures (the stream_t15 pattern,
  * generalized r17): a lifecycle entry whose producer tree is a
  * deterministic function of the (immutable) corpus dir builds it ONCE
  * per process and either reads it directly (entries that never mutate
  * it — the t11Src precedent) or clones it per execution
  * ([[Writers.copyTree]] for relative-path trees like Delta and the
  * graft-native format, [[graft.interop.IcebergRelocate]] for Iceberg's
  * absolute-path metadata) and mutates the clone.
  *
  * This is bench governance, not a semantics change: the producer
  * lifecycle stays graded wherever its behavior IS the claim (feature
  * ratchets and format gates are `require`d against the built tree on
  * every execution), and the per-run cost becomes the graded operator
  * plus an O(bytes) file copy instead of a re-run of identical Spark
  * commit jobs.
  *
  * Builds go through [[graft.core.Once]] — never under a map bin lock,
  * failed builds retry, rivals wait on the winner's future. */
object Prefix {
  private val built = graft.core.Once.futures[java.nio.file.Path]()

  /** Build the fixture named `name` for corpus `d` at most once per
    * process; returns its root. The build function receives a fresh
    * empty directory. The tree MUST be treated as immutable afterward. */
  def once(name: String, d: String)(build: java.nio.file.Path => Unit): java.nio.file.Path =
    graft.core.Once.build(built, s"$name|$d") {
      val base = Scratch.dir("prefix", name, d)
      Writers.deleteTree(base)
      java.nio.file.Files.createDirectories(base)
      build(base)
      base
    }

  /** Build-once + clone-per-run in one call: the fixture's `sub` tree
    * clones into `dest` (deleted first — [[Writers.copyTree]] requires
    * a fresh destination). For RELATIVE-PATH trees only (Delta and the
    * graft-native format); Iceberg clones must go through
    * [[graft.interop.IcebergRelocate]] instead (absolute-path
    * metadata). */
  def cloneTo(name: String, d: String, sub: String, dest: String)(
      build: java.nio.file.Path => Unit): Unit = {
    val p = once(name, d)(build)
    Writers.deleteTree(java.nio.file.Paths.get(dest))
    Writers.copyTree(p.resolve(sub), java.nio.file.Paths.get(dest))
  }
}
