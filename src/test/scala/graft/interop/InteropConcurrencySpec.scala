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
    val afterDelete = Iceberg.appendRebaseConflict(mAfterAppend, meta())
    assert(afterDelete.exists(_.contains("delete")),
      s"a rival delete must refuse the rebase: $afterDelete")
    val mAfterDelete = meta()
    Iceberg.replaceSpec(spark, path, Seq("bucket(4, k)"))
    val afterSpec = Iceberg.appendRebaseConflict(mAfterDelete, meta())
    assert(afterSpec.exists(_.contains("spec")),
      s"a rival spec change must refuse the rebase: $afterSpec")
  }
}
