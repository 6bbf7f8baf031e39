package graft.ingest

import java.nio.file.{Path, Paths}

/** Per-process scratch directories for entries that materialize state
  * (ingest round-trips, streaming sinks/checkpoints) — one idiom, one
  * cleanup hook (r3 review: stream_t7/t9 hand-rolled the pid-dir pattern
  * without the hook and leaked a directory tree per JVM).
  *
  * The pid component makes concurrent harness processes collision-free;
  * within one process reruns reuse/overwrite deterministically. The
  * shutdown hook removes only THIS process's subtree (other p* dirs may
  * belong to live processes). */
object Scratch {

  private val procRoot: Path =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft_scratch",
      s"p${ProcessHandle.current().pid()}")

  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => Writers.deleteTree(procRoot)))

  /** Scratch dir keyed by (area, entry, sf dir): e.g.
    * `.../graft_scratch/p1234/streaming/t7_root_testdata_sf0.01`. */
  def dir(area: String, name: String, sfDir: String): Path = {
    cleanupHook
    procRoot.resolve(area).resolve(s"${name}_${sfDir.replaceAll("[^a-zA-Z0-9.]", "_")}")
  }

  /** The process's V2-catalog warehouse root — session-constant (the
    * `spark.sql.catalog.graft.warehouse` conf is set once at build),
    * cleaned with the rest of the scratch tree. */
  def warehouse: Path = {
    cleanupHook
    procRoot.resolve("warehouse")
  }
}
