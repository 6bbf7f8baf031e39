package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** Optimistic-concurrency RETRY on the interop writers (r11 verdict
  * next #2): a blind append that loses the create-if-absent commit
  * race re-reads the head, verifies the rival work commutes, and
  * REBASES — both protocols' logical conflict rule (disjoint appends
  * commute; anything that changed the row set, schema, spec, or
  * protocol keeps throwing). Integration races via concurrent
  * futures (the same shape as VersionedSpec's lost-update proof);
  * the conflict gates are proven deterministically on handcrafted
  * rival commits. */
class InteropConcurrencySpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  import scala.concurrent.{Await, Future}
  import scala.concurrent.duration._
  import scala.concurrent.ExecutionContext.Implicits.global

  test("Delta: four concurrent appends ALL land via rebase — no losers, no lost update") {
    import spark.implicits._
    val path = freshDir("conc_delta")
    DeltaLake.write(Seq((0L, "base")).toDF("k", "v"), path)
    val results = Await.result(Future.sequence((1 to 4).map { i =>
      Future(
        try Right(DeltaLake.write(Seq((i.toLong, s"w$i")).toDF("k", "v"), path,
          mode = SaveMode.Append))
        catch { case e: java.util.ConcurrentModificationException => Left(e.getMessage) })
    }), 120.seconds)
    val wins = results.collect { case Right(v) => v }
    assert(wins.size == 4, s"a contending append failed instead of rebasing: $results")
    assert(wins.distinct.size == 4, s"two appends shared a version: $results")
    assert(DeltaLake.snapshot(spark, path).version == 4L)
    assert(DeltaLake.read(spark, path).count() == 5,
      s"an append's rows were lost in the rebase: $results")
  }

  test("Iceberg: four concurrent appends ALL land via rebase — no losers, no lost update") {
    import spark.implicits._
    val path = freshDir("conc_ice")
    Iceberg.write(Seq((0L, "base")).toDF("k", "v"), path)
    val results = Await.result(Future.sequence((1 to 4).map { i =>
      Future(
        try Right(Iceberg.write(Seq((i.toLong, s"w$i")).toDF("k", "v"), path,
          mode = SaveMode.Append))
        catch { case e: java.util.ConcurrentModificationException => Left(e.getMessage) })
    }), 120.seconds)
    val wins = results.collect { case Right(v) => v }
    assert(wins.size == 4, s"a contending append failed instead of rebasing: $results")
    assert(Iceberg.snapshots(path).size == 5, "every rebased append must publish a snapshot")
    assert(Iceberg.read(spark, path).count() == 5,
      s"an append's rows were lost in the rebase: $results")
    // rebased appends sequence consecutively — the manifest lists stay sane
    val s = Iceberg.snapshot(spark, path)
    assert(s.files.map(_.seq).sorted == Seq(1L, 2L, 3L, 4L, 5L),
      s"rebased appends must take consecutive sequence numbers: ${s.files.map(_.seq)}")
  }

  test("Delta: row-tracking appends rebase with RE-STAMPED id ranges — no collisions") {
    import spark.implicits._
    val path = freshDir("conc_delta_rt")
    DeltaLake.write(Seq((0L, "base")).toDF("k", "v"), path)
    DeltaLake.enableRowTracking(spark, path)
    val results = Await.result(Future.sequence((1 to 3).map { i =>
      Future(
        try Right(DeltaLake.write(Seq((i.toLong, s"w$i")).toDF("k", "v"), path,
          mode = SaveMode.Append))
        catch { case e: java.util.ConcurrentModificationException => Left(e.getMessage) })
    }), 120.seconds)
    assert(results.forall(_.isRight), s"row-tracked appends must rebase too: $results")
    val ids = DeltaLake.readWithRowTracking(spark, path)
      .select("_row_id").as[Long].collect().toSeq
    assert(ids.distinct.size == ids.size,
      s"a rebase re-used a rival's row-id range: $ids")
  }

  test("Delta gate: blind-append rivals rebase; remove/metaData rivals refuse") {
    import spark.implicits._
    val path = freshDir("conc_delta_gate")
    DeltaLake.write(Seq((1L, "a")).toDF("k", "v"), path) // v0: protocol+metaData
    DeltaLake.write(Seq((2L, "b")).toDF("k", "v"), path, mode = SaveMode.Append) // v1: blind
    DeltaLake.write(Seq((9L, "z")).toDF("k", "v"), path) // v2: overwrite (remove+metaData)
    val (fs, root) = Writers.fsFor(path)
    assert(DeltaLake.rivalConflict(fs, root, 1, 1).isEmpty,
      "a blind append rival must be rebasable")
    val r2 = DeltaLake.rivalConflict(fs, root, 2, 2)
    assert(r2.exists(m => m.contains("remove") || m.contains("metaData")),
      s"an overwrite rival must refuse the rebase: $r2")
  }

  test("Iceberg gate: append rivals rebase; delete/schema/spec rivals refuse") {
    import spark.implicits._
    val path = freshDir("conc_ice_gate")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def meta(): com.fasterxml.jackson.databind.JsonNode = {
      val dir = Paths.get(path, "metadata")
      val vs = java.nio.file.Files.list(dir).iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
      while (vs.hasNext) { val p = vs.next(); if (p.toString.endsWith(".metadata.json")) buf += p }
      om.readTree(new String(java.nio.file.Files.readAllBytes(
        buf.maxBy(_.getFileName.toString)), "UTF-8"))
    }
    Iceberg.write(Seq((1L, "a")).toDF("k", "v"), path)
    val m0 = meta()
    Iceberg.write(Seq((2L, "b")).toDF("k", "v"), path, mode = SaveMode.Append)
    assert(Iceberg.appendRebaseConflict(m0, meta()).isEmpty,
      "an append rival must be rebasable")
    val mAfterAppend = meta()
    Iceberg.deleteMergeOnRead(spark, path, org.apache.spark.sql.functions.col("k") === 1L)
    // OCC level 2: a blind append reads NO table state — a rival
    // merge-on-read delete commutes with it (the r12 gate that refused
    // here closed; FastAppend semantics)
    assert(Iceberg.appendRebaseConflict(mAfterAppend, meta()).isEmpty,
      "a rival delete commutes with a blind append")
    val mAfterDelete = meta()
    Iceberg.replaceSpec(spark, path, Seq("bucket(4, k)"))
    val afterSpec = Iceberg.appendRebaseConflict(mAfterDelete, meta())
    assert(afterSpec.exists(_.contains("spec")),
      s"a rival spec change must refuse the rebase: $afterSpec")
  }

  // ---------------------------------------------------------------
  // OCC level 2: disjoint rewrite/delete rivals commute; overlapping
  // ones refuse (r12 verdict next #1). Gate decisions deterministic;
  // the real races follow.
  // ---------------------------------------------------------------

  test("Delta gate: rival remove commutes iff disjoint from the read set") {
    import spark.implicits._
    val path = freshDir("conc_delta_gate2")
    DeltaLake.write(Seq((1L, "a")).toDF("k", "v"), path) // v0
    DeltaLake.write(Seq((2L, "b")).toDF("k", "v"), path, mode = SaveMode.Append) // v1
    val beforeCompact = DeltaLake.snapshot(spark, path).files.map(_.path).toSet
    assert(DeltaLake.compact(spark, path) == 2L) // v2: remove both + packed add
    val (fs, root) = Writers.fsFor(path)
    // a transaction that READ one of the compacted files cannot rebase
    val overlapping = DeltaLake.rivalConflict(fs, root, 2, 2, beforeCompact.take(1))
    assert(overlapping.exists(_.contains("read set")),
      s"a rival that removed a read-set file must refuse: $overlapping")
    // one with a disjoint read set (or none at all) commutes
    assert(DeltaLake.rivalConflict(fs, root, 2, 2, Set("some-other-file.parquet")).isEmpty,
      "a disjoint rival remove must commute")
    assert(DeltaLake.rivalConflict(fs, root, 2, 2).isEmpty,
      "a blind append (empty read set) must rebase past a compaction")
  }

  test("Iceberg gate: rewrite rebases past disjoint rivals, refuses overlapping ones") {
    import spark.implicits._
    val path = freshDir("conc_ice_gate2")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def meta(): com.fasterxml.jackson.databind.JsonNode = {
      val dir = Paths.get(path, "metadata")
      val vs = java.nio.file.Files.list(dir).iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
      while (vs.hasNext) { val p = vs.next(); if (p.toString.endsWith(".metadata.json")) buf += p }
      om.readTree(new String(java.nio.file.Files.readAllBytes(
        buf.maxBy(_.getFileName.toString)), "UTF-8"))
    }
    val (fs, _) = Writers.fsFor(path)
    Iceberg.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), path)
    Iceberg.write(Seq((3L, "c")).toDF("k", "v").coalesce(1), path, mode = SaveMode.Append)
    val files = Iceberg.snapshot(spark, path).files
      .map(f => graft.interop.Hive.fsPathNoDecode(f.path))
    assert(files.size == 2)
    // the upcoming rival delete targets k=1 — find its file directly
    val k1File = files.find(p =>
      spark.read.parquet(p).filter(org.apache.spark.sql.functions.col("k") === 1L)
        .count() > 0).get
    val otherFile = files.find(_ != k1File).get
    val base = meta()
    // rival APPEND: any scope still rebases
    Iceberg.write(Seq((4L, "d")).toDF("k", "v"), path, mode = SaveMode.Append)
    assert(Iceberg.rewriteRebaseConflict(spark, fs, base, meta(), files.toSet).isEmpty,
      "a rewrite must rebase past a rival blind append")
    // a rival merge-on-read DELETE into the scope refuses (rewriting
    // the target file would resurrect the deleted row); a disjoint
    // scope commutes
    val base2 = meta()
    Iceberg.deleteMergeOnRead(spark, path, org.apache.spark.sql.functions.col("k") === 1L)
    val overlap = Iceberg.rewriteRebaseConflict(spark, fs, base2, meta(), Set(k1File))
    assert(overlap.exists(_.contains("scope")),
      s"a rival delete into the rewrite's scope must refuse: $overlap")
    assert(Iceberg.rewriteRebaseConflict(spark, fs, base2, meta(), Set(otherFile)).isEmpty,
      "a rival delete disjoint from the rewrite's scope must commute")
    // rival COMPACTION that rewrote the scope file: refuses
    val base3 = meta()
    Iceberg.compact(spark, path)
    val gone = Iceberg.rewriteRebaseConflict(spark, fs, base3, meta(), Set(otherFile))
    assert(gone.exists(_.contains("scope")),
      s"a rival compaction of a scope file must refuse: $gone")
  }

  test("Delta: compaction racing a blind append — BOTH land, whoever loses rebases") {
    import spark.implicits._
    val path = freshDir("conc_delta_cmp")
    DeltaLake.write(Seq((0L, "base")).toDF("k", "v"), path)
    DeltaLake.write(Seq((1L, "w1")).toDF("k", "v"), path, mode = SaveMode.Append)
    val results = Await.result(Future.sequence(Seq(
      Future(try Right(DeltaLake.compact(spark, path))
        catch { case e: java.util.ConcurrentModificationException => Left(e.getMessage) }),
      Future(try Right(DeltaLake.write(Seq((2L, "w2")).toDF("k", "v"), path,
          mode = SaveMode.Append))
        catch { case e: java.util.ConcurrentModificationException => Left(e.getMessage) }),
    )), 120.seconds)
    assert(results.forall(_.isRight),
      s"compaction and append must BOTH land, rebasing on a lost race: $results")
    assert(DeltaLake.read(spark, path).count() == 3, "no row lost, none duplicated")
    assert(DeltaLake.snapshot(spark, path).version == 3L,
      "both the compaction and the append must have committed")
  }

  test("Iceberg: compaction racing a blind append — BOTH land, whoever loses rebases") {
    import spark.implicits._
    val path = freshDir("conc_ice_cmp")
    Iceberg.write(Seq((0L, "base")).toDF("k", "v"), path)
    Iceberg.write(Seq((1L, "w1")).toDF("k", "v"), path, mode = SaveMode.Append)
    val results = Await.result(Future.sequence(Seq(
      Future(try Right(Iceberg.compact(spark, path))
        catch { case e: java.util.ConcurrentModificationException => Left(e.getMessage) }),
      Future(try Right(Iceberg.write(Seq((2L, "w2")).toDF("k", "v"), path,
          mode = SaveMode.Append))
        catch { case e: java.util.ConcurrentModificationException => Left(e.getMessage) }),
    )), 120.seconds)
    assert(results.forall(_.isRight),
      s"compaction and append must BOTH land, rebasing on a lost race: $results")
    assert(Iceberg.read(spark, path).count() == 3, "no row lost, none duplicated")
    assert(Iceberg.snapshots(path).size == 4,
      "both the compaction and the append must have published snapshots")
  }

  test("Delta: a DATA-CHANGING rewrite NEVER rebases — its lost race surfaces") {
    import spark.implicits._
    val path = freshDir("conc_delta_dml")
    // the invariant under contention: deltaRewriteRebases must not
    // move for a predicate delete (dataChange=true — a rival append
    // may add rows the predicate read never saw), whether the race is
    // lost (CME surfaces) or the scheduler serialized the round
    var surfaced: Option[String] = None
    var round = 0
    while (surfaced.isEmpty && round < 6) {
      round += 1
      Writers.deleteTree(path)
      DeltaLake.write((0L to 9L).map(i => (i, s"r$i")).toDF("k", "v"), path)
      val before = CommitIntrospect.deltaRewriteRebases.get()
      val results = Await.result(Future.sequence(Seq(
        Future(try Right(DeltaLake.deleteWhere(spark, path,
            org.apache.spark.sql.functions.col("k") < 5L))
          catch { case e: java.util.ConcurrentModificationException => Left(e.getMessage) }),
        Future(try Right(DeltaLake.write(Seq((100L, "rival")).toDF("k", "v"), path,
            mode = SaveMode.Append))
          catch { case e: java.util.ConcurrentModificationException => Left(e.getMessage) }),
      )), 120.seconds)
      assert(CommitIntrospect.deltaRewriteRebases.get() == before,
        "a data-changing rewrite must never take the maintenance rebase path")
      results.head.left.foreach(m => surfaced = Some(m))
      assert(results(1).isRight, s"the blind append must always land: $results")
      if (results.head.isRight)
        // no collision this round — the serial outcome must be exact
        assert(DeltaLake.read(spark, path).count() == 6)
    }
    // when a collision DID happen, the loss surfaced as a loud CME
    surfaced.foreach(m => assert(m.nonEmpty))
  }
}
