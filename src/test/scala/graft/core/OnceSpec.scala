package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** [[Once]] — the claim-future build gate behind every per-corpus
  * fixture cache ([[graft.ingest.Prefix]], the accuracy gates, the
  * quantizer/PQ caches): at most one successful build per key, failures
  * retry, rivals wait outside any lock, re-entrancy fails loudly. */
class OnceSpec extends AnyFunSuite {

  test("builds once per key; every caller sees the winner's value") {
    val m = Once.futures[Int]()
    val builds = new java.util.concurrent.atomic.AtomicInteger()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      import scala.jdk.CollectionConverters._
      val tasks = (1 to 32).map { _ =>
        (() => Once.build(m, "k") { builds.incrementAndGet(); 42 }): java.util.concurrent.Callable[Int]
      }
      val got = pool.invokeAll(tasks.asJava).asScala.map(_.get())
      assert(got.forall(_ == 42) && builds.get() == 1,
        s"expected exactly one build, got ${builds.get()}")
    } finally pool.shutdown()
  }

  test("a failed build clears its claim so the next caller retries") {
    val m = Once.futures[Int]()
    val attempts = new java.util.concurrent.atomic.AtomicInteger()
    intercept[RuntimeException](Once.build(m, "k") {
      attempts.incrementAndGet(); throw new RuntimeException("boom")
    })
    assert(Once.build(m, "k") { attempts.incrementAndGet(); 7 } == 7)
    assert(attempts.get() == 2)
  }

  test("a re-entrant build of the same key fails loudly instead of self-deadlocking") {
    val m = Once.futures[Int]()
    val e = intercept[IllegalStateException](Once.build(m, "k") {
      Once.build(m, "k")(1) // the work function requests its own fixture
    })
    assert(e.getMessage.contains("re-entrant"))
    // the failed claim was released: a clean build still succeeds
    assert(Once.build(m, "k")(5) == 5)
    // DIFFERENT keys nest fine (a fixture building atop another fixture)
    val m2 = Once.futures[Int]()
    assert(Once.build(m2, "outer") { Once.build(m2, "inner")(1) + 1 } == 2)
  }
}
