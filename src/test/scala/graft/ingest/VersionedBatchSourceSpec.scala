package graft.ingest

import graft.SparkFixture
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VersionedFileIndex
import org.scalatest.funsuite.AnyFunSuite

/** The batch half of the graft-versioned connector: a Catalyst FileIndex
  * over one committed snapshot, pruning on partition values and manifest
  * file stats during planning. */
class VersionedBatchSourceSpec extends AnyFunSuite with SparkFixture {

  private def tmp(name: String): String = {
    val p = s"/tmp/graft-test/batchsource/$name"
    Writers.deleteTree(p)
    p
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no FileSourceScanExec in plan"))

  test("stats pruning: a range filter drops whole files at planning, result exact") {
    val s = spark
    import s.implicits._
    val path = tmp("stats")
    val src = (1L to 4000L).map(i => (i, s"r$i", i % 7)).toDF("k", "s", "m")
    Versioned.commitClustered(src, path, clusterCol = "k", nFiles = 10)

    val df = s.read.format("graft-versioned").load(path).filter($"k" >= 500L && $"k" <= 900L)
    val scan = scanOf(df)
    val planned = scan.selectedPartitions.totalNumberOfFiles
    assert(planned > 0 && planned < 10, s"expected pruning, planned $planned of 10")
    assert(VersionedFileIndex.lastPlanned(path).exists { case (kept, total) =>
      kept == planned && total == 10 })
    // parquet pushdown survives below the index
    assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual"))
    assert(df.agg(count(lit(1)), sum($"k")).as[(Long, Long)].head() ==
      ((401L, (500L to 900L).sum)))
  }

  test("equality and one-sided filters prune; files without stats always survive") {
    val s = spark
    import s.implicits._
    val path = tmp("nostats")
    Versioned.commitClustered(
      (1L to 1000L).map(i => (i, i * 2)).toDF("k", "v"), path, clusterCol = "k", nFiles = 5)
    // an append WITHOUT statsCols: its file must never be skipped
    Versioned.appendCommit((5000L to 5100L).map(i => (i, i * 2)).toDF("k", "v"), path)

    val all = Versioned.manifest(path, 2L)
    val statless = all.count(_.stats.isEmpty)
    assert(statless >= 1, "the plain append must carry no stats")

    val eq = s.read.format("graft-versioned").load(path).filter($"k" === 42L)
    eq.collect()
    val (keptEq, totalEq) = VersionedFileIndex.lastPlanned(path).get
    assert(totalEq == all.size && keptEq == 1 + statless,
      s"equality should keep 1 stats file + every stats-less file, got $keptEq/$totalEq")
    assert(eq.count() == 1)

    val oneSided = s.read.format("graft-versioned").load(path).filter($"k" > 900L)
    assert(oneSided.as[(Long, Long)].collect().map(_._1).sorted.toSeq ==
      ((901L to 1000L) ++ (5000L to 5100L)))
    val (kept1, _) = VersionedFileIndex.lastPlanned(path).get
    assert(kept1 < all.size, "one-sided numeric bound should still prune clustered files")
  }

  test("bloom pruning: the connector FileIndex consults per-file blooms for equality probes") {
    // the s35_bloom_pointlookup claim battery (spec-moved r14): keys
    // hash-distributed so every file spans the whole id range — min/max
    // stats can never prune, only the bloom can. The graded entry keeps
    // one library probe; this test holds the connector leg and the
    // multi-key battery.
    val s = spark
    import s.implicits._
    val path = tmp("bloom")
    val src = (1L to 4000L).map(i => (i, i % 13)).toDF("k", "v")
    Versioned.commit(src.repartition(8, $"k"), path, bloomCols = Seq("k"))
    // library probes across several keys, each must skip whole files
    Seq(137L, 901L, 1200L).foreach { probe =>
      val f = Versioned.readSkippingEq(s, path, "k", probe)
      assert(f.count() == 1L)
      val (kept, total) = Versioned.lastBloomProbe(path).get
      assert(total >= 8 && kept < total, s"bloom must skip files on k = $probe ($kept/$total)")
    }
    // the SAME pruning through Catalyst: equality filter on the
    // connector plans fewer files than the snapshot holds
    val viaConn = s.read.format("graft-versioned").load(path).filter($"k" === 137L)
    assert(viaConn.count() == 1L)
    val (planned, total) = VersionedFileIndex.lastPlanned(path).get
    assert(planned < total,
      s"the FileIndex must consult blooms for equality filters ($planned of $total planned)")
    // and a range filter must NOT consult blooms (hash domain is
    // equality-only): all files survive
    val range = s.read.format("graft-versioned").load(path).filter($"k" >= 1L)
    assert(range.count() == 4000L)
  }

  test("partition pruning: only the filtered k=v directory's files are planned") {
    val s = spark
    import s.implicits._
    val path = tmp("parts")
    val src = (1L to 300L).map(i => (i, Seq("a", "b", "c")(i.toInt % 3), i * 10)).toDF("id", "grp", "v")
    Versioned.commitPartitioned(src, path, "grp")

    val df = s.read.format("graft-versioned").load(path).filter($"grp" === "b")
    val scan = scanOf(df)
    assert(scan.partitionFilters.nonEmpty, "grp = 'b' must classify as a partition filter")
    assert(scan.selectedPartitions.partitionCount == 1)
    val got = df.select($"id", $"grp", $"v").as[(Long, String, Long)].collect().sortBy(_._1)
    val want = src.filter($"grp" === "b").as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("write connector: every mode commits through the manifest protocol") {
    val s = spark
    import s.implicits._
    val path = tmp("write")

    (1L to 100L).map(i => (i, i * 2)).toDF("k", "v")
      .write.format("graft-versioned").mode("overwrite").save(path)
    assert(Versioned.currentVersion(path).contains(1L))

    (101L to 150L).map(i => (i, i * 2)).toDF("k", "v")
      .write.format("graft-versioned").mode("append").option("batchId", "b1").save(path)
    assert(Versioned.currentVersion(path).contains(2L))
    // replayed batch id: the write must be a no-op, not a duplicate
    (101L to 150L).map(i => (i, i * 2)).toDF("k", "v")
      .write.format("graft-versioned").mode("append").option("batchId", "b1").save(path)
    assert(Versioned.currentVersion(path).contains(2L), "replayed batchId must not commit")
    assert(s.read.format("graft-versioned").load(path).count() == 150L)

    // statsCols on append: the fresh files carry min/max and prune
    (5000L to 5999L).map(i => (i, i * 2)).toDF("k", "v")
      .write.format("graft-versioned").mode("append").option("statsCols", "k").save(path)
    val probe = s.read.format("graft-versioned").load(path).filter($"k" >= 5500L)
    assert(probe.count() == 500L)

    val err = intercept[IllegalArgumentException] {
      (1L to 5L).map(i => (i, i)).toDF("k", "v")
        .write.format("graft-versioned").mode("errorIfExists").save(path)
    }
    assert(err.getMessage.contains("already has a committed version"))
    (1L to 5L).map(i => (i, i)).toDF("k", "v")
      .write.format("graft-versioned").mode("ignore").save(path)
    assert(Versioned.currentVersion(path).contains(3L), "ignore must not commit")
  }

  test("write connector: partitionBy lands the Hive layout; append refuses to mix") {
    val s = spark
    import s.implicits._
    val path = tmp("write_parts")
    val src = (1L to 300L).map(i => (i, Seq("x", "y", "z")(i.toInt % 3), i * 10)).toDF("id", "grp", "v")
    src.write.format("graft-versioned").mode("overwrite").partitionBy("grp").save(path)

    val df = s.read.format("graft-versioned").load(path).filter($"grp" === "y")
    val scan = scanOf(df)
    assert(scan.partitionFilters.nonEmpty && scan.selectedPartitions.partitionCount == 1)
    assert(df.count() == 100L)

    val mix = intercept[Exception] {
      src.write.format("graft-versioned").mode("append").partitionBy("grp").save(path)
    }
    assert(mix.getMessage.contains("mix layouts"))
  }

  test("SQL surface: CREATE TABLE USING serves reads; INSERT INTO lands through the manifest") {
    val s = spark
    import s.implicits._
    val path = tmp("sql")
    (1L to 60L).map(i => (i, s"n$i")).toDF("k", "name")
      .write.format("graft-versioned").mode("overwrite").save(path)

    s.sql("DROP TABLE IF EXISTS graft_sql_tbl")
    s.sql(s"CREATE TABLE graft_sql_tbl USING `graft-versioned` OPTIONS (path '$path')")
    try {
      assert(s.sql("SELECT count(*) FROM graft_sql_tbl WHERE k > 30").as[Long].head() == 30L)
      // plain INSERT INTO routes through the InsertableRelation seam:
      // ONE manifest-protocol append commit, no unrecorded files
      s.sql("INSERT INTO graft_sql_tbl VALUES (999, 'landed')")
      assert(Versioned.currentVersion(path).contains(2L),
        "INSERT INTO must land as one appendCommit")
      s.sql("REFRESH TABLE graft_sql_tbl") // v1 file-table contract: cached relation pins a snapshot
      assert(s.sql("SELECT count(*) FROM graft_sql_tbl").as[Long].head() == 61L)
      assert(Versioned.read(s, path).count() == 61L,
        "the SQL-inserted row must be a manifest-recorded file, visible to the library read")
      // INSERT OVERWRITE replaces the snapshot through the same seam
      s.sql("INSERT OVERWRITE graft_sql_tbl VALUES (1, 'only')")
      s.sql("REFRESH TABLE graft_sql_tbl")
      assert(Versioned.currentVersion(path).contains(3L))
      assert(s.sql("SELECT count(*) FROM graft_sql_tbl").as[Long].head() == 1L)
    } finally s.sql("DROP TABLE IF EXISTS graft_sql_tbl")
  }

  test("SQL surface backstop: a static PARTITION clause INSERT is refused unstaged") {
    val s = spark
    import s.implicits._
    val path = tmp("sql_part")
    Versioned.commitPartitioned(
      Seq((1L, "a", "P1"), (2L, "b", "P2")).toDF("k", "name", "p"), path, "p")
    s.sql("DROP TABLE IF EXISTS graft_sql_part")
    s.sql(s"CREATE TABLE graft_sql_part (k BIGINT, name STRING, p STRING) " +
      s"USING `graft-versioned` PARTITIONED BY (p) OPTIONS (path '$path')")
    try {
      // the PARTITION-clause shape bypasses InsertableRelation (it plans
      // InsertIntoHadoopFsRelationCommand) — the read-only format must
      // refuse it BEFORE any file is staged outside the manifest
      val e = intercept[Exception] {
        s.sql("INSERT INTO graft_sql_part PARTITION (p='P1') VALUES (999, 'rogue')")
      }
      def causes(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
      assert(causes(e).exists(c => Option(c.getMessage).exists(_.contains("manifest never records"))),
        s"static-partition INSERT must be refused by the read-only format, got: $e")
      assert(Versioned.currentVersion(path).contains(1L))
      assert(Versioned.read(s, path).count() == 2L, "the refusal must stage nothing")
    } finally s.sql("DROP TABLE IF EXISTS graft_sql_part")
  }

  test("readChangeFeed serves the per-commit history; windows and key are enforced") {
    val s = spark
    import s.implicits._
    val path = tmp("cdf")
    Versioned.commit((1L to 10L).map(i => (i, s"v$i")).toDF("k", "s"), path) // v1
    Versioned.appendCommit((11L to 15L).map(i => (i, s"v$i")).toDF("k", "s"), path) // v2
    Versioned.upsert(s, path, Seq((3L, "EDIT")).toDF("k", "s"), "k") // v3
    Versioned.deleteMergeOnRead(s, path, Seq(4L, 11L).toDF("k"), "k") // v4

    def feed(opts: (String, String)*) = {
      val r = s.read.format("graft-versioned")
        .option("readChangeFeed", "true").option("keyColumn", "k")
      opts.foreach { case (n, v) => r.option(n, v) }
      r.load(path).select($"commit_version", $"change_type", $"k", $"s")
        .as[(Long, String, Long, String)].collect().sortBy(t => (t._1, t._3)).toSeq
    }

    val full = feed()
    assert(full.filter(_._1 == 1L) == (1L to 10L).map(i => (1L, "insert", i, s"v$i")),
      "v1 must bootstrap as inserts")
    assert(full.filter(_._1 == 2L) == (11L to 15L).map(i => (2L, "insert", i, s"v$i")),
      "the append window's feed is exactly its new rows")
    assert(full.filter(_._1 == 3L) == Seq((3L, "update", 3L, "EDIT")))
    assert(full.filter(_._1 == 4L) ==
      Seq((4L, "delete", 4L, "v4"), (4L, "delete", 11L, "v11")),
      "MoR deletes must feed before-images of exactly the deleted keys")

    // windowing: inclusive start and end, matching the full feed's slices
    assert(feed("startingVersion" -> "3") == full.filter(_._1 >= 3L))
    assert(feed("startingVersion" -> "2", "endingVersion" -> "3") ==
      full.filter(t => t._1 >= 2L && t._1 <= 3L))
    // library API and connector serve the same frame
    val lib = Versioned.changeFeed(s, path, 1L, 4L, "k")
      .select($"commit_version", $"change_type", $"k", $"s")
      .as[(Long, String, Long, String)].collect().sortBy(t => (t._1, t._3)).toSeq
    assert(lib == full)

    val noKey = intercept[IllegalArgumentException] {
      s.read.format("graft-versioned").option("readChangeFeed", "true").load(path)
    }
    assert(noKey.getMessage.contains("keyColumn"))
  }

  test("after vacuum, an unwindowed change feed bootstraps at the retention floor") {
    val s = spark
    import s.implicits._
    val path = tmp("cdf_vacuum")
    Versioned.commit(Seq((1L, "a")).toDF("k", "v"), path) // v1
    Versioned.upsert(s, path, Seq((1L, "a2"), (2L, "b")).toDF("k", "v"), "k") // v2
    Versioned.upsert(s, path, Seq((3L, "c")).toDF("k", "v"), "k") // v3
    Versioned.appendCommit(Seq((4L, "d")).toDF("k", "v"), path) // v4
    Versioned.vacuum(path, keepLast = 2) // v1/v2 gone; floor is v3
    val feed = s.read.format("graft-versioned")
      .option("readChangeFeed", "true").option("keyColumn", "k").load(path)
      .select($"commit_version", $"change_type", $"k", $"v")
      .as[(Long, String, Long, String)].collect().sortBy(t => (t._1, t._3)).toSeq
    // v3's snapshot becomes the bootstrap (its own diff vs vacuumed v2 is
    // unreplayable by design); v4 still feeds incrementally
    assert(feed == Seq(
      (3L, "insert", 1L, "a2"), (3L, "insert", 2L, "b"), (3L, "insert", 3L, "c"),
      (4L, "insert", 4L, "d")),
      s"post-vacuum feed must bootstrap at the floor: $feed")
    // an explicit window below the floor fails loudly, not silently empty
    val below = intercept[Exception] {
      s.read.format("graft-versioned")
        .option("readChangeFeed", "true").option("keyColumn", "k")
        .option("startingVersion", "2").load(path).collect()
    }
    assert(Option(below.getMessage).exists(m =>
      m.contains("committed") || m.contains("changeFeed")), s"got: $below")
  }

  test("history and CDF read through the connector on a partitioned table") {
    val s = spark
    import s.implicits._
    val path = tmp("cdf_parts")
    Versioned.commitPartitioned(
      Seq((1L, "a", "P1"), (2L, "b", "P2")).toDF("k", "v", "pt"), path, "pt") // v1
    Versioned.appendCommitPartitioned(Seq((3L, "c", "P1")).toDF("k", "v", "pt"), path) // v2
    Versioned.upsertPartitioned(s, path, Seq((2L, "B", "P2")).toDF("k", "v", "pt"), "k", "pt") // v3

    val feed = s.read.format("graft-versioned")
      .option("readChangeFeed", "true").option("keyColumn", "k").load(path)
      .select($"commit_version", $"change_type", $"k", $"v", $"pt")
      .as[(Long, String, Long, String, String)].collect().sortBy(t => (t._1, t._3)).toSeq
    assert(feed == Seq(
      (1L, "insert", 1L, "a", "P1"), (1L, "insert", 2L, "b", "P2"),
      (2L, "insert", 3L, "c", "P1"),
      (3L, "update", 2L, "B", "P2")),
      s"partitioned CDF wrong: $feed")

    val h = s.read.format("graft-versioned").option("history", "true").load(path)
      .select($"version", $"operation").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(h == Seq((1L, "commit"), (2L, "append"), (3L, "rewrite")),
      s"connector history wrong: $h")
  }

  test("versionAsOf pins a snapshot; MoR debt serves via fallback; evolution refused") {
    val s = spark
    import s.implicits._
    val path = tmp("travel")
    Versioned.commit((1L to 10L).map(i => (i, s"v$i")).toDF("k", "s"), path)
    Versioned.appendCommit((11L to 20L).map(i => (i, s"v$i")).toDF("k", "s"), path)

    val v1 = s.read.format("graft-versioned").option("versionAsOf", "1").load(path)
    assert(v1.count() == 10)
    assert(s.read.format("graft-versioned").load(path).count() == 20)

    Versioned.deleteMergeOnRead(s, path, (1L to 3L).toDF("k"), "k")
    // a snapshot with deletion-vector debt SERVES through the library
    // fallback relation (SQL keeps working between DELETE and
    // compaction); the vector is applied, pruning resumes after folding
    val mor = s.read.format("graft-versioned").load(path)
    assert(mor.count() == 17, "the fallback must apply the deletion vector")
    assert(mor.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.isEmpty, "MoR debt must not plan as a bare file scan")
    // pinned below the MoR commit still serves the pruning relation
    assert(s.read.format("graft-versioned").option("versionAsOf", "2").load(path).count() == 20)
    Versioned.compactDeletes(s, path)
    assert(s.read.format("graft-versioned").load(path).queryExecution.executedPlan
      .collectLeaves().collectFirst { case f: FileSourceScanExec => f }.nonEmpty,
      "compaction must restore the pruning FileIndex relation")

    val evo = tmp("evolved")
    Versioned.commit((1L to 5L).map(i => (i, s"n$i")).toDF("k", "name"), evo)
    Versioned.renameColumn(evo, "name", "title")
    val e = intercept[IllegalArgumentException] {
      s.read.format("graft-versioned").load(evo).collect()
    }
    assert(e.getMessage.contains("schema evolution"))
  }

  test("SQL UPDATE and DELETE FROM plan to the library primitives; subqueries refused") {
    val s = spark
    import s.implicits._
    val path = tmp("sql_dml")
    Versioned.commit((1L to 40L).map(i => (i, i * 10L, s"n$i")).toDF("k", "score", "name"), path)
    s.sql("DROP TABLE IF EXISTS graft_dml_tbl")
    s.sql(s"CREATE TABLE graft_dml_tbl USING `graft-versioned` OPTIONS (path '$path')")
    try {
      // predicate UPDATE: copy-on-write, expression over the row itself
      s.sql("UPDATE graft_dml_tbl SET score = score + 5, name = upper(name) WHERE k % 10 = 0")
      assert(Versioned.currentVersion(path).contains(2L))
      val updated = Versioned.read(s, path).filter($"k" === 20L).head()
      assert(updated.getAs[Long]("score") == 205L && updated.getAs[String]("name") == "N20")
      assert(Versioned.read(s, path).filter($"k" === 21L).head().getAs[Long]("score") == 210L,
        "UPDATE must not touch rows outside the predicate")
      // DELETE FROM: lands as a deletion vector — zero data files rewritten
      s.sql("DELETE FROM graft_dml_tbl WHERE score > 350")
      assert(Versioned.currentVersion(path).contains(3L))
      assert(Versioned.manifest(path, 3L).filter(_.kind == Versioned.KindData).toSet ==
        Versioned.manifest(path, 2L).toSet,
        "SQL DELETE must commit a deletion vector, not rewrite data")
      assert(Versioned.read(s, path).count() == 35L) // 36..40 gone (score 360..400; 40 updated to 405)
      // an UPDATE with no WHERE touches every row
      s.sql("UPDATE graft_dml_tbl SET name = lower(name)")
      assert(Versioned.read(s, path).select("name").collect().forall(r =>
        r.getString(0) == r.getString(0).toLowerCase))
      // subqueries in the condition are refused loudly, nothing committed
      val before = Versioned.currentVersion(path)
      val e = intercept[Exception] {
        s.sql("DELETE FROM graft_dml_tbl WHERE k IN (SELECT k FROM graft_dml_tbl WHERE score > 100)")
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("subqueries")), s"wrong refusal: $e")
      assert(Versioned.currentVersion(path) == before)
    } finally s.sql("DROP TABLE IF EXISTS graft_dml_tbl")
  }

  test("DSv1 CTAS lands as ONE manifest-protocol commit and serves the rows") {
    // the CreatableRelationProvider seam (CREATE TABLE ... USING
    // `graft-versioned` OPTIONS(path ...) AS SELECT) — carried the s33
    // entry's CTAS leg until r10's bench trim moved the claim here
    val s = spark
    import s.implicits._
    val path = tmp("ctas")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .createOrReplaceTempView("bs_ctas_src")
    s.sql("DROP TABLE IF EXISTS graft_bs_ctas")
    try {
      s.sql(s"CREATE TABLE graft_bs_ctas USING `graft-versioned` OPTIONS (path '$path') " +
        "AS SELECT k, v FROM bs_ctas_src WHERE k < 3")
      assert(Versioned.currentVersion(path).contains(1L),
        "CTAS must land as ONE manifest-protocol commit")
      assert(s.sql("SELECT count(*) FROM graft_bs_ctas").head().getLong(0) == 2L)
      assert(s.sql("SELECT v FROM graft_bs_ctas WHERE k = 2").head().getString(0) == "b")
    } finally s.sql("DROP TABLE IF EXISTS graft_bs_ctas")
  }
}
