package graft.interop

import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.hadoop.fs.{Path => HPath}
import org.scalatest.funsuite.AnyFunSuite

/** The commit-arbitration PRIMITIVE both interop writers claim
  * versions through (r12): Hadoop's local filesystem implements
  * `create(f, overwrite = false)` as check-then-act, so two
  * simultaneous committers could BOTH pass the exists probe and the
  * second silently overwrote the first — an actual lost commit,
  * observed under 4-way append contention before the fix.
  * [[CommitFiles.createExclusive]] routes `file:` claims through
  * O_EXCL; this spec locks the kernel-arbitrated exactly-one-winner
  * contract under direct contention. */
class CommitFilesSpec extends AnyFunSuite {

  test("createExclusive: exactly one of N simultaneous claimants wins; content survives") {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", "commitfiles")
    Writers.deleteTree(dir)
    val (fs, _) = Writers.fsFor(dir.toString)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    (1 to 5).foreach { round =>
      val dest = new HPath(dir.toString, s"v$round.json")
      val gate = new java.util.concurrent.CountDownLatch(1)
      val results = Future.sequence((1 to 8).map { i =>
        Future {
          gate.await()
          try {
            val out = CommitFiles.createExclusive(fs, dest)
            try out.write(s"winner-$i".getBytes("UTF-8")) finally out.close()
            Some(i)
          } catch { case _: java.io.IOException => None }
        }
      })
      gate.countDown()
      val wins = Await.result(results, 60.seconds).flatten
      assert(wins.size == 1,
        s"round $round: exactly one claimant must win, got $wins")
      val in = fs.open(dest)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
      assert(text == s"winner-${wins.head}",
        s"round $round: the winner's bytes must survive intact (got '$text')")
    }
  }

  test("createExclusive refuses a pre-existing file like create-if-absent did") {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", "commitfiles2")
    Writers.deleteTree(dir)
    val (fs, _) = Writers.fsFor(dir.toString)
    val dest = new HPath(dir.toString, "v1.json")
    val out = CommitFiles.createExclusive(fs, dest)
    try out.write("first".getBytes("UTF-8")) finally out.close()
    intercept[java.io.IOException](CommitFiles.createExclusive(fs, dest))
    val in = fs.open(dest)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    assert(text == "first")
  }
}
