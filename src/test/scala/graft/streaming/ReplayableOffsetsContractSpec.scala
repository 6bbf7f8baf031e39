package graft.streaming

import graft.SparkFixture
import graft.ingest.{Versioned, Writers}
import java.nio.file.Paths
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graft.VersionedSourceProvider
import org.scalatest.funsuite.AnyFunSuite

/** The CONNECTOR-AGNOSTIC replayable-offsets contract (r16 verdict #7,
  * SURVEY §7.4) — the laws every exactly-once streaming source obeys,
  * proven against the `graft-versioned` source seam by driving the
  * Source API directly (not through a query): any connector satisfying
  * these laws plugs into the same consume loops. A Kafka source is the
  * canonical external instance; the container ships no kafka jar and no
  * network (SURVEY G6), so the MAPPING is documented here and the laws
  * are proven on the local implementation:
  *
  *  | contract law                | graft-versioned        | Kafka source            |
  *  |-----------------------------|------------------------|-------------------------|
  *  | offset = durable JSON token | version number         | partition→offset map    |
  *  | source of truth             | table commit log       | partition logs          |
  *  | batch (from, to] replayable | manifest(delta) files  | consumer seek + poll    |
  *  | admission control           | maxVersionsPerBatch    | maxOffsetsPerTrigger    |
  *  | fresh-stream origin         | startingVersion        | startingOffsets         |
  *  | AvailableNow                | head pinned at prepare | end offsets snapshotted |
  *  | history reclaimed           | vacuum → loud failure  | retention → OffsetOutOfRange (failOnDataLoss) |
  *
  * Laws proven below: (1) offsets serialize to JSON and a restarted
  * engine hands them back as [[SerializedOffset]] — the source must
  * treat the round-trip as identity; (2) offset ranges COMPOSE — the
  * batch for (a, c] equals (a, b] ⊎ (b, c], so an engine may cut
  * micro-batch boundaries anywhere (crash/restart re-batching) without
  * changing the delivered multiset; (3) replaying the same range is
  * deterministic (exactly-once = deterministic replay + idempotent
  * sink, the two halves this format's sink/source pair implements);
  * (4) admission-bounded catch-up reaches the same final state as one
  * unbounded batch; (5) an idle source yields NO batch (null advance),
  * never an empty one; (6) AvailableNow drains exactly the backlog
  * that existed at prepare time; (7) replaying history the store has
  * reclaimed fails loudly rather than silently skipping. */
class ReplayableOffsetsContractSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def mkSource(tbl: String, opts: Map[String, String] = Map.empty) =
    new VersionedSourceProvider().createSource(
      spark.sqlContext, freshDir(s"roc_meta_${System.nanoTime()}"), None,
      "graft-versioned", Map("path" -> tbl) ++ opts)

  private def threeCommitTable(name: String): String = {
    import spark.implicits._
    val tbl = s"${freshDir(name)}/tbl"
    Versioned.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), tbl)
    Versioned.appendCommit(Seq((3L, "c")).toDF("k", "v"), tbl)
    Versioned.appendCommit(Seq((4L, "d"), (5L, "e")).toDF("k", "v"), tbl)
    tbl
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    org.apache.spark.sql.graft.StreamIntrospect.asBatch(df)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("law 1+5: offsets are JSON-durable (SerializedOffset round-trip); an idle source yields null, not an empty batch") {
    val tbl = threeCommitTable("roc_json")
    val src = mkSource(tbl)
    val head = src.getOffset.get
    assert(head == LongOffset(3L), s"offset must be the commit version: $head")
    // the engine checkpoints offset.json and hands back SerializedOffset
    // on restart — the round-trip must be identity for getBatch
    val viaJson = src.getBatch(Some(SerializedOffset(LongOffset(1L).json)), head)
    val viaTyped = src.getBatch(Some(LongOffset(1L)), head)
    assert(rows(viaJson) == rows(viaTyped) && rows(viaJson) == Set((3L, "c"), (4L, "d"), (5L, "e")))
    // no progress => NO batch: latestOffset(head) must be null — a
    // connector that emits empty batches busy-spins every trigger
    val sac = src.asInstanceOf[org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]
    assert(sac.latestOffset(head.asInstanceOf[org.apache.spark.sql.connector.read.streaming.Offset],
      ReadLimit.allAvailable()) == null, "idle source must advance to null")
  }

  test("law 2+3: offset ranges compose and replay deterministically") {
    val tbl = threeCommitTable("roc_compose")
    val src = mkSource(tbl)
    val all = rows(src.getBatch(Some(LongOffset(0L)), LongOffset(3L)))
    val stepped = rows(src.getBatch(Some(LongOffset(0L)), LongOffset(1L))) ++
      rows(src.getBatch(Some(LongOffset(1L)), LongOffset(2L))) ++
      rows(src.getBatch(Some(LongOffset(2L)), LongOffset(3L)))
    assert(all == stepped && all.size == 5,
      s"(a,c] must equal (a,b] ∪ (b,c] — engines re-cut batch boundaries on restart: $all vs $stepped")
    // replay determinism: the same range twice is the same multiset —
    // the half of exactly-once the SOURCE owns (the sink owns idempotence)
    assert(rows(src.getBatch(Some(LongOffset(1L)), LongOffset(3L))) ==
      rows(src.getBatch(Some(LongOffset(1L)), LongOffset(3L))))
  }

  test("law 4: admission-bounded catch-up reaches the unbounded final state in gap-free steps") {
    val tbl = threeCommitTable("roc_bounded")
    val src = mkSource(tbl, Map("maxVersionsPerBatch" -> "1"))
    val sac = src.asInstanceOf[org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]
    var from: Option[LongOffset] = None
    var got = Set.empty[(Long, String)]
    var steps = 0
    var advanced = true
    while (advanced) {
      val next = sac.latestOffset(
        from.orNull.asInstanceOf[org.apache.spark.sql.connector.read.streaming.Offset],
        ReadLimit.allAvailable())
      if (next == null) advanced = false
      else {
        val end = LongOffset(next.json().trim.toLong)
        // gap-free: each step starts exactly where the last ended
        got = got ++ rows(src.getBatch(from, end))
        from = Some(end); steps += 1
      }
    }
    assert(steps == 3, s"maxVersionsPerBatch=1 must drain 3 commits in 3 steps, took $steps")
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
  }

  test("law 6: AvailableNow pins the drain target at prepare time") {
    import spark.implicits._
    val tbl = threeCommitTable("roc_avnow")
    val src = mkSource(tbl)
    val stan = src.asInstanceOf[org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow]
    val sac = src.asInstanceOf[org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]
    stan.prepareForTriggerAvailableNow()
    // a commit lands AFTER prepare: this run must not see it
    Versioned.appendCommit(Seq((9L, "late")).toDF("k", "v"), tbl)
    val end = sac.latestOffset(null, ReadLimit.allAvailable())
    assert(end != null && end.json().trim.toLong == 3L,
      s"AvailableNow must cap at the prepared head (3), got $end")
    // a fresh source (next trigger) serves the late commit
    assert(mkSource(tbl).getOffset.contains(LongOffset(4L)))
  }

  test("law 7: replaying reclaimed history fails loudly, never silently skips") {
    import spark.implicits._
    val tbl = s"${freshDir("roc_vacuum")}/tbl"
    Versioned.appendCommit(Seq((1L, "a")).toDF("k", "v"), tbl)
    Versioned.appendCommit(Seq((2L, "b")).toDF("k", "v"), tbl)
    // a snapshot REWRITE unreferences v1/v2's files (vacuum on a purely
    // append-only history reclaims nothing — every old file is still
    // part of the head snapshot)
    Versioned.commit(Seq((9L, "z")).toDF("k", "v"), tbl)
    Versioned.vacuum(tbl, keepLast = 1)
    val src = mkSource(tbl, Map("ignoreChanges" -> "true"))
    // a checkpoint pointing below the retention floor: the consumer's
    // data is GONE — failing loudly is the failOnDataLoss contract
    // (silently skipping would un-notice lost deliveries)
    intercept[Exception] {
      rows(src.getBatch(Some(LongOffset(0L)), LongOffset(1L)))
    }
  }
}
