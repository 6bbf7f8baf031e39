package graft.functions

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The deletion-vector decode cache is JVM-GLOBAL (r10 ADVICE): filter
  * instances are per deserialized task, so an instance-local cache
  * would re-decode every blob once per task — O(tasks × blobs) IO on a
  * long scan. The cache keys on [[DvPositionSource.cacheKey]] (stable
  * across serialization), never on instance identity. */
class DvCacheSpec extends AnyFunSuite {

  private final class CountingSource(key: String, pos: Array[Long],
      counter: AtomicInteger) extends DvPositionSource {
    override def cacheKey: String = key
    override def positions(): Array[Long] = { counter.incrementAndGet(); pos }
  }

  test("two filter instances sharing a descriptor decode its blob ONCE per JVM") {
    val decodes = new AtomicInteger(0)
    val key = s"dvcache-spec-${java.util.UUID.randomUUID()}"
    def freshMap() = new DvDescriptorMap("tbl/",
      Map("data/f1.parquet" ->
        Seq(new CountingSource(key, Array(3L, 7L), decodes): DvPositionSource)))
    val probe = UTF8String.fromString("/tbl/data/f1.parquet")
    val a = freshMap() // "task 1"
    assert(a.contains(probe, 3L) && !a.contains(probe, 4L))
    assert(decodes.get == 1, "first probe decodes")
    val b = freshMap() // "task 2" — a distinct deserialized instance
    assert(b.contains(probe, 7L) && !b.contains(probe, 0L))
    assert(decodes.get == 1,
      s"the second instance must hit the JVM-global cache, not re-decode " +
        s"(decoded ${decodes.get} times)")
    // a DIFFERENT descriptor identity is a different cache entry
    val other = new AtomicInteger(0)
    val c = new DvDescriptorMap("tbl/", Map("data/f1.parquet" ->
      Seq(new CountingSource(key + "-v2", Array(5L), other): DvPositionSource)))
    assert(c.contains(probe, 5L) && !c.contains(probe, 3L))
    assert(other.get == 1, "a superseding blob (new cacheKey) decodes fresh")
  }

  test("DvDiff composes: newly covered = child minus parent, task-side") {
    val n = new AtomicInteger(0)
    def src(key: String, pos: Array[Long]) =
      Seq(new CountingSource(s"dvdiff-$key-${java.util.UUID.randomUUID()}", pos, n)
        : DvPositionSource)
    val parent = new DvDescriptorMap("t/", Map("data/a" -> src("p", Array(1L, 2L))))
    val child = new DvDescriptorMap("t/", Map("data/a" -> src("c", Array(1L, 2L, 9L))))
    val diff = new DvDiff(child, parent)
    val f = UTF8String.fromString("/t/data/a")
    assert(diff.contains(f, 9L), "newly covered this commit")
    assert(!diff.contains(f, 1L), "carried coverage is not a new delete")
    assert(!diff.contains(f, 5L), "never covered")
  }
}
