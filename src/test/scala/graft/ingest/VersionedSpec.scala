package graft.ingest

import graft.SparkFixture
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

class VersionedSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p) // the production recursive delete, not a spec-local copy
    p.toString
  }

  test("commit/read round trip; versions increment; upsert merges by key") {
    import spark.implicits._
    val path = freshDir("versioned_rt")
    assert(Versioned.currentVersion(path).isEmpty)
    val v1 = Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    assert(v1 == 1L && Versioned.currentVersion(path).contains(1L))
    val v2 = Versioned.upsert(spark, path, Seq((2L, "b2"), (3L, "c")).toDF("k", "v"), "k")
    assert(v2 == 2L)
    val cur = Versioned.read(spark, path).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(cur == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
    // time travel: v1 unchanged by the merge
    val old = Versioned.readAt(spark, path, 1L).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(old == Map(1L -> "a", 2L -> "b"))
    assert(Versioned.versions(path) == Seq(1L, 2L))
  }

  test("a crashed commit (claimed, data written, marker missing) is invisible to readers") {
    import spark.implicits._
    val path = freshDir("versioned_crash")
    Versioned.commit(Seq((1L, "a")).toDF("k", "v"), path)
    // simulate a crash: the v2 attempt claimed its dir and even finished
    // writing data, but died before the _committed marker
    val v2dir = Paths.get(path, "v00002")
    Files.createDirectories(v2dir)
    Files.createFile(v2dir.resolve("_claim"))
    Seq((9L, "ghost")).toDF("k", "v").write.parquet(v2dir.resolve("data").toString)
    assert(Versioned.currentVersion(path).contains(1L), "uncommitted attempt must be invisible")
    assert(Versioned.read(spark, path).count() == 1)
    intercept[IllegalArgumentException](Versioned.readAt(spark, path, 2L))
    // a replace-all commit must NOT reuse the claimed version (advances)
    val v = Versioned.commit(Seq((2L, "b")).toDF("k", "v"), path)
    assert(v == 3L, s"claimed-but-crashed version was reused: got v$v")
    assert(Versioned.versions(path) == Seq(1L, 3L))
    // …while a DERIVED commit from base 3 needs slot 4, which is free
    assert(Versioned.appendCommit(Seq((4L, "d")).toDF("k", "v"), path) == 4L)
  }

  test("a derived commit whose base+1 slot is claimed fails loudly instead of dropping the rival") {
    import spark.implicits._
    val path = freshDir("versioned_conflict")
    Versioned.commit(Seq((1L, "a")).toDF("k", "v"), path)
    // rival writer (or crashed attempt) holds the base+1 slot
    val v2dir = Paths.get(path, "v00002")
    Files.createDirectories(v2dir)
    Files.createFile(v2dir.resolve("_claim"))
    intercept[java.util.ConcurrentModificationException](
      Versioned.appendCommit(Seq((2L, "b")).toDF("k", "v"), path))
    intercept[java.util.ConcurrentModificationException](
      Versioned.upsert(spark, path, Seq((1L, "x")).toDF("k", "v"), "k"))
    assert(Versioned.versions(path) == Seq(1L), "a losing derived commit must publish nothing")
    // age-gated recovery clears the crashed claim; the derived commit then lands
    assert(Versioned.recoverClaims(path, olderThanMs = 0L) == Seq(2L))
    assert(Versioned.appendCommit(Seq((2L, "b")).toDF("k", "v"), path) == 2L)
    assert(Versioned.read(spark, path).count() == 2)
  }

  test("concurrent derived commits: one winner PER BASE, losers error, no lost update") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val path = freshDir("versioned_lostupdate")
    Versioned.commit(Seq((0L, "base")).toDF("k", "v"), path)
    // The guarantee is one winner per BASE, not per test run: a future
    // scheduled after an earlier winner's commit legitimately reads the
    // NEW base and also wins. The invariant that can never break is that
    // every winner's rows survive into the final snapshot — appends are
    // cumulative, so final count = 1 base row + one row per winner.
    val results = Await.result(Future.sequence((1 to 4).map { i =>
      Future(
        try Right(Versioned.appendCommit(Seq((i.toLong, s"w$i")).toDF("k", "v"), path))
        catch { case e: java.util.ConcurrentModificationException => Left(e) })
    }), 120.seconds)
    val wins = results.collect { case Right(v) => v }
    assert(wins.nonEmpty && wins.distinct.size == wins.size,
      s"winners must hold distinct versions: $results")
    assert(Versioned.read(spark, path).count() == 1 + wins.size,
      s"a winning append's rows were lost: ${results}")
  }

  test("a merge-on-read delete keyed on a missing column is rejected before committing") {
    import spark.implicits._
    val path = freshDir("versioned_mor_badkey")
    Versioned.commit(Seq((1L, "a")).toDF("k", "v"), path)
    // committing this would poison every later read AND the compaction
    // repair path — it must fail loudly up front instead
    val e = intercept[IllegalArgumentException](
      Versioned.deleteMergeOnRead(spark, path, Seq(1L).toDF("wrong_key"), "wrong_key"))
    assert(e.getMessage.contains("wrong_key"))
    assert(Versioned.versions(path) == Seq(1L), "the poison delete must not commit")
    assert(Versioned.read(spark, path).count() == 1)
  }

  test("vacuum pins the base of an in-flight derived commit and everything it references") {
    import spark.implicits._
    val path = freshDir("versioned_vacuum_pin")
    Versioned.commit(Seq((1L, "a")).toDF("k", "v"), path)            // v1
    Versioned.appendCommit(Seq((2L, "b")).toDF("k", "v"), path)      // v2 (references v1)
    // an in-flight derived commit from base 2 holds the claim on v3…
    val v3dir = Paths.get(path, "v00003")
    Files.createDirectories(v3dir)
    Files.createFile(v3dir.resolve("_claim"))
    // …while a replace-all writer lands v4
    Versioned.commit(Seq((9L, "z")).toDF("k", "v"), path)            // v4
    // keepLast=1 would normally reclaim v1+v2 — but the v3 writer carries
    // v2's manifest (which references v1): both must survive until the
    // claim resolves
    assert(Versioned.vacuum(path, keepLast = 1) == 0,
      "vacuum deleted versions an in-flight derived commit still references")
    assert(Versioned.readAt(spark, path, 2L).count() == 2)
    // once the claim is reclaimed, the same vacuum reclaims v1+v2
    Versioned.recoverClaims(path, olderThanMs = 0L)
    assert(Versioned.vacuum(path, keepLast = 1) == 2)
    assert(Versioned.versions(path) == Seq(4L))
  }

  test("full-rewrite delete and a clean-table compaction respect the partitioned layout") {
    import spark.implicits._
    val path = freshDir("versioned_del_layout")
    Versioned.commitPartitioned(
      Seq((1L, "a", "P1"), (2L, "b", "P2"), (3L, "c", "P2")).toDF("k", "v", "pt"), path, "pt")
    // compaction with no outstanding deletes is a NO-OP, not a rewrite
    assert(Versioned.compactDeletes(spark, path) == 1L)
    assert(Versioned.versions(path) == Seq(1L))
    // a copy-on-write delete preserves the Hive layout…
    Versioned.delete(spark, path, Seq(1L).toDF("k"), "k")
    assert(Versioned.manifest(path, 2L).forall(_.partDir.startsWith("pt=")),
      "delete flattened the partitioned layout")
    // …so partition-scoped merges still work afterwards
    Versioned.upsertPartitioned(spark, path, Seq((2L, "b2", "P2")).toDF("k", "v", "pt"), "k", "pt")
    val rows = Versioned.read(spark, path).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(rows == Map(2L -> "b2", 3L -> "c"))
  }

  test("a reader pinned before a commit keeps its snapshot (isolation), even mid-plan") {
    import spark.implicits._
    val path = freshDir("versioned_pin")
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    val pinned = Versioned.read(spark, path) // resolves v1 NOW
    Versioned.upsert(spark, path, Seq((1L, "CHANGED")).toDF("k", "v"), "k")
    // the pinned frame still reads v1's immutable directory
    val got = pinned.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "b"), s"snapshot isolation broken: $got")
    // while a fresh resolve sees v2
    val now = Versioned.read(spark, path).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(now == Map(1L -> "CHANGED", 2L -> "b"))
  }

  test("vacuum keeps the newest K committed versions; crashed claims need age-gated recovery") {
    import spark.implicits._
    val path = freshDir("versioned_vacuum")
    for (i <- 1 to 4) Versioned.commit(Seq((i.toLong, s"v$i")).toDF("k", "v"), path)
    // plus a crashed attempt between 4 and a fifth (replace-all) commit
    val crashed = Paths.get(path, "v00005")
    Files.createDirectories(crashed)
    Files.createFile(crashed.resolve("_claim"))
    Versioned.commit(Seq((6L, "v6")).toDF("k", "v"), path) // v6
    val removed = Versioned.vacuum(path, keepLast = 2)
    // committed history is 1,2,3,4,6 (the claim collision pushed the last
    // commit to v6); keep {4,6} → doomed: v1,v2,v3. The crashed v5 is NOT
    // vacuum's to take — it might belong to a live writer
    assert(removed == 3, s"expected 3 committed dirs removed, got $removed")
    assert(Files.exists(crashed), "vacuum must not touch an uncommitted claim")
    assert(Versioned.versions(path) == Seq(4L, 6L))
    intercept[IllegalArgumentException](Versioned.readAt(spark, path, 1L))
    assert(Versioned.readAt(spark, path, 4L).count() == 1)
    intercept[IllegalArgumentException](Versioned.vacuum(path, 0))
    // the crashed claim is recoverClaims' job, behind an age threshold
    assert(Versioned.recoverClaims(path, olderThanMs = 1000L * 3600) == Nil)
    assert(Versioned.recoverClaims(path, olderThanMs = 0L) == Seq(5L))
    assert(!Files.exists(crashed))
  }

  test("partitioned merge rewrites only touched partitions; untouched files carry by reference") {
    import spark.implicits._
    val path = freshDir("versioned_cow")
    val base = Seq((1L, "a", "P1"), (2L, "b", "P1"), (3L, "c", "P2"), (4L, "d", "P3"))
      .toDF("k", "v", "pt")
    Versioned.commitPartitioned(base, path, "pt")
    Versioned.upsertPartitioned(spark, path, Seq((3L, "c2", "P2")).toDF("k", "v", "pt"), "k", "pt")
    // content: only P2 changed
    val cur = Versioned.read(spark, path).collect()
      .map(r => r.getAs[Long]("k") -> (r.getAs[String]("v"), r.getAs[String]("pt"))).toMap
    assert(cur == Map(1L -> ("a", "P1"), 2L -> ("b", "P1"), 3L -> ("c2", "P2"), 4L -> ("d", "P3")))
    // layout: P1/P3 files are v1's, verbatim; P2's are v2's
    val m1 = Versioned.manifest(path, 1L).toSet
    val m2 = Versioned.manifest(path, 2L)
    val (p2, rest) = m2.partition(_.partDir == "pt=P2")
    assert(rest.nonEmpty && rest.forall(m1.contains), "untouched partitions were rewritten")
    assert(rest.forall(_.relPath.startsWith("v00001/")))
    assert(p2.nonEmpty && p2.forall(_.relPath.startsWith("v00002/")))
    // partition column reconstructs across mixed-version file groups
    assert(Versioned.read(spark, path).filter($"pt" === "P1").count() == 2)
    // time travel still sees the pre-merge P2
    assert(Versioned.readAt(spark, path, 1L).filter($"k" === 3L)
      .collect().head.getAs[String]("v") == "c")
  }

  test("merging into a brand-new partition needs no existing files to read") {
    import spark.implicits._
    val path = freshDir("versioned_newpart")
    Versioned.commitPartitioned(Seq((1L, "a", "P1")).toDF("k", "v", "pt"), path, "pt")
    Versioned.upsertPartitioned(spark, path, Seq((9L, "z", "P9")).toDF("k", "v", "pt"), "k", "pt")
    val cur = Versioned.read(spark, path).collect().map(r => r.getAs[Long]("k")).sorted.toSeq
    assert(cur == Seq(1L, 9L))
  }

  test("vacuum never deletes a version dir still referenced by a retained manifest") {
    import spark.implicits._
    val path = freshDir("versioned_ref_vacuum")
    Versioned.commitPartitioned(
      Seq((1L, "a", "P1"), (2L, "b", "P2")).toDF("k", "v", "pt"), path, "pt")
    Versioned.upsertPartitioned(spark, path, Seq((2L, "b2", "P2")).toDF("k", "v", "pt"), "k", "pt")
    // keepLast=1 retains only v2 — but v2's manifest references v1's P1
    // files, so v1's directory MUST survive
    val removed = Versioned.vacuum(path, keepLast = 1)
    assert(removed == 0, "vacuum deleted a version still referenced by the current manifest")
    val cur = Versioned.read(spark, path).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(cur == Map(1L -> "a", 2L -> "b2"))
    // a full rewrite (plain upsert) drops the reference; then v1/v2 can go
    Versioned.upsert(spark, path, Seq((1L, "a3", "P1")).toDF("k", "v", "pt"), "k")
    val removed2 = Versioned.vacuum(path, keepLast = 1)
    assert(removed2 == 2, s"expected v1+v2 reclaimed once unreferenced, got $removed2")
    assert(Versioned.read(spark, path).count() == 2)
  }

  test("appendCommit carries history by reference and tolerates an added column") {
    import spark.implicits._
    val path = freshDir("versioned_append")
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    // day 2's extract carries a NEW column — older files must read NULL
    Versioned.appendCommit(Seq((3L, "c", 1.5)).toDF("k", "v", "score"), path)
    val m2 = Versioned.manifest(path, 2L)
    assert(m2.exists(_.relPath.startsWith("v00001/")), "append rewrote history instead of referencing it")
    assert(m2.exists(_.relPath.startsWith("v00002/")))
    val rows = Versioned.read(spark, path).collect()
      .map(r => r.getAs[Long]("k") -> Option(r.getAs[Any]("score"))).toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(1.5)))
    // v1 time travel still has the pre-drift schema
    assert(!Versioned.readAt(spark, path, 1L).columns.contains("score"))
  }

  test("changes() emits exactly the keyed diff with correct images") {
    import spark.implicits._
    val path = freshDir("versioned_cdc")
    Versioned.commit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), path)
    Versioned.upsert(spark, path, Seq((2L, "b2"), (4L, "d")).toDF("k", "v"), "k") // update + insert
    Versioned.delete(spark, path, Seq(1L).toDF("k"), "k")                         // delete
    val d12 = Versioned.changes(spark, path, 1L, 2L, "k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type"), r.getAs[String]("v"))).sortBy(_._1)
    assert(d12.toSeq == Seq((2L, "update", "b2"), (4L, "insert", "d")),
      s"v1->v2 diff wrong: ${d12.toSeq}")
    val d23 = Versioned.changes(spark, path, 2L, 3L, "k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type"), r.getAs[String]("v")))
    assert(d23.toSeq == Seq((1L, "delete", "a")), s"v2->v3 diff wrong: ${d23.toSeq}")
    // transitive feed: v1->v3 collapses the update+insert+delete correctly
    val d13 = Versioned.changes(spark, path, 1L, 3L, "k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type"))).sortBy(_._1)
    assert(d13.toSeq == Seq((1L, "delete"), (2L, "update"), (4L, "insert")))
    // guards: inverted range and drift both fail loudly
    intercept[IllegalArgumentException](Versioned.changes(spark, path, 2L, 1L, "k"))
    Versioned.appendCommit(Seq((9L, "z", 0.1)).toDF("k", "v", "score"), path)
    intercept[IllegalArgumentException](Versioned.changes(spark, path, 3L, 4L, "k"))
  }

  test("appendCommitOnce is idempotent per batch id; meta is atomic with the commit") {
    import spark.implicits._
    val path = freshDir("versioned_once")
    val v1 = Versioned.appendCommitOnce(Seq((1L, "a")).toDF("k", "v"), path, batchId = "7")
    assert(v1 == 1L)
    assert(Versioned.commitMeta(path, 1L) == Map("graft.batchId" -> "7"))
    // replay of the same batch id: no new version, same version returned,
    // even though the data frame differs (a replay after crash re-derives
    // the batch — byte equality is not guaranteed, id equality is)
    val again = Versioned.appendCommitOnce(Seq((9L, "ghost")).toDF("k", "v"), path, batchId = "7")
    assert(again == 1L && Versioned.versions(path) == Seq(1L))
    assert(Versioned.read(spark, path).count() == 1)
    // the NEXT batch commits normally and appends
    val v2 = Versioned.appendCommitOnce(Seq((2L, "b")).toDF("k", "v"), path, batchId = "8")
    assert(v2 == 2L && Versioned.read(spark, path).count() == 2)
  }

  test("concurrent committers all land distinct committed versions (claim race)") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val path = freshDir("versioned_race")
    val futures = (1 to 6).map { i =>
      Future(Versioned.commit(Seq((i.toLong, s"w$i")).toDF("k", "v"), path))
    }
    val got = Await.result(Future.sequence(futures), 120.seconds)
    assert(got.toSet.size == 6, s"two writers shared a version: $got")
    assert(Versioned.versions(path).size == 6)
    // the table is last-commit-wins per version; every version is readable
    got.foreach(v => assert(Versioned.readAt(spark, path, v).count() == 1))
  }

  test("readPartitions prunes at the manifest — untouched partitions' files never reach Spark") {
    import spark.implicits._
    import org.apache.spark.sql.functions.input_file_name
    val path = freshDir("versioned_prune")
    Versioned.commitPartitioned(
      Seq((1L, "a", "P1"), (2L, "b", "P2"), (3L, "c", "P3")).toDF("k", "v", "pt"), path, "pt")
    Versioned.upsertPartitioned(spark, path, Seq((2L, "b2", "P2")).toDF("k", "v", "pt"), "k", "pt")
    val pruned = Versioned.readPartitions(spark, path, "pt", Set("P2"))
    assert(pruned.collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSeq == Seq((2L, "b2")))
    // file-level proof: only pt=P2 paths were handed to the reader
    val files = pruned.select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("pt=P2")), s"pruning leaked files: ${files.toSeq}")
    // asking for a partition that has no files fails loudly
    intercept[IllegalArgumentException](Versioned.readPartitions(spark, path, "pt", Set("NOPE")))
  }

  test("merge-on-read delete rewrites nothing; a later append may reuse the key (sequencing)") {
    import spark.implicits._
    val path = freshDir("versioned_mor")
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    Versioned.deleteMergeOnRead(spark, path, Seq(1L).toDF("k"), "k")
    // zero data files moved: v2's data entries are exactly v1's
    val m2 = Versioned.manifest(path, 2L)
    assert(m2.filter(_.kind == Versioned.KindData).toSet == Versioned.manifest(path, 1L).toSet)
    assert(m2.exists(e => e.kind == Versioned.KindDelete && e.relPath.startsWith("v00002/")))
    assert(Versioned.read(spark, path).collect().map(_.getLong(0)).toSeq == Seq(2L))
    // a key deleted at v2 may be legitimately re-appended at v3: the
    // delete is version-sequenced and must NOT swallow the newer row
    Versioned.appendCommit(Seq((1L, "reborn")).toDF("k", "v"), path)
    val rows = Versioned.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "reborn", 2L -> "b"),
      s"delete swallowed a row appended AFTER it: $rows")
    // compaction folds the delete debt into pure data files, same content
    Versioned.compactDeletes(spark, path)
    assert(Versioned.manifest(path, 4L).forall(_.kind == Versioned.KindData))
    val after = Versioned.read(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after == rows)
    // time travel through the MoR version still applies its delete
    assert(Versioned.readAt(spark, path, 2L).collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("partition-scoped operations refuse while merge-on-read deletes are outstanding") {
    import spark.implicits._
    val path = freshDir("versioned_mor_guard")
    Versioned.commitPartitioned(
      Seq((1L, "a", "P1"), (2L, "b", "P2")).toDF("k", "v", "pt"), path, "pt")
    Versioned.deleteMergeOnRead(spark, path, Seq(1L).toDF("k"), "k")
    // carrying a partition by reference would detach it from the delete
    intercept[IllegalArgumentException](
      Versioned.upsertPartitioned(spark, path, Seq((2L, "b2", "P2")).toDF("k", "v", "pt"), "k", "pt"))
    intercept[IllegalArgumentException](
      Versioned.readPartitions(spark, path, "pt", Set("P2")))
    // read() applies the delete; after compaction the guards lift AND the
    // partitioned layout survives, so partition-scoped merges work again
    assert(Versioned.read(spark, path).collect().map(_.getAs[Long]("k")).toSeq == Seq(2L))
    Versioned.compactDeletes(spark, path)
    assert(Versioned.manifest(path, 3L).forall(_.partDir.startsWith("pt=")),
      "compaction flattened the Hive-partitioned layout")
    Versioned.upsertPartitioned(spark, path, Seq((2L, "b2", "P2")).toDF("k", "v", "pt"), "k", "pt")
    val rows = Versioned.read(spark, path).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(rows == Map(2L -> "b2"))
  }

  test("upsert rejects duplicate and NULL merge keys before touching history") {
    import spark.implicits._
    val path = freshDir("versioned_guard")
    Versioned.commit(Seq((1L, "a")).toDF("k", "v"), path)
    intercept[IllegalArgumentException](
      Versioned.upsert(spark, path, Seq((2L, "x"), (2L, "y")).toDF("k", "v"), "k"))
    assert(Versioned.versions(path) == Seq(1L), "failed upsert must not create a version")
  }
}
