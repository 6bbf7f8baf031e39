package graft.interop

import graft.SparkFixture
import graft.ingest.{Versioned, Writers}
import java.nio.file.Paths
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** SQL MAINTENANCE (r10 verdict "missing #3"): the nightly loop runs
  * from pure SQL through Spark 4 DSv2 stored procedures on the graft
  * catalog — `CALL graft.system.compact/vacuum/expire_snapshots/
  * rewrite_manifests(...)` — dispatching to the formats' existing
  * maintenance APIs, with loud refusals where a format lacks the op. */
class MaintenanceProceduresSpec extends AnyFunSuite with SparkFixture {

  private def wh(db: String) =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", "warehouse", db)

  test("CALL compact bin-packs small files on all three formats; WHERE scopes partitions") {
    import spark.implicits._
    val whd = wh("dbmp"); Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbmp")
    def manySmall(path: String, fmt: String): Unit = (0 until 5).foreach { i =>
      val df = Seq((i.toLong, s"r$i")).toDF("k", "v")
      fmt match {
        case "delta" => DeltaLake.write(df, path,
          mode = if (i == 0) SaveMode.Overwrite else SaveMode.Append)
        case "iceberg" => Iceberg.write(df, path,
          mode = if (i == 0) SaveMode.Overwrite else SaveMode.Append)
        case _ => if (i == 0) Versioned.commit(df, path)
                  else { Versioned.appendCommit(df, path); () }
      }
    }
    manySmall(whd.resolve("td").toString, "delta")
    manySmall(whd.resolve("ti").toString, "iceberg")
    manySmall(whd.resolve("tg").toString, "graft")
    for (t <- Seq("td", "ti", "tg")) {
      val res = spark.sql(s"CALL graft.system.compact('dbmp.$t')").collect()
      assert(res.length == 1, s"one summary row for $t")
      assert(spark.table(s"graft.dbmp.$t").count() == 5L, s"content intact for $t")
    }
    assert(DeltaLake.snapshot(spark, whd.resolve("td").toString).files.size == 1)
    assert(Iceberg.snapshot(spark, whd.resolve("ti").toString).files.size == 1)
    // partition-scoped: only the named partition's files rewrite
    val pd = whd.resolve("tp").toString
    DeltaLake.write((0 until 40).map(i => (i.toLong, (i % 2).toString)).toDF("k", "p")
      .repartition(4), pd, partitionBy = Seq("p"))
    val pre = DeltaLake.snapshot(spark, pd).files
      .filter(_.partitionValues.get("p").contains("1")).map(_.path).toSet
    spark.sql("CALL graft.system.compact('dbmp.tp', `where` => 'p=0')")
    val post = DeltaLake.snapshot(spark, pd).files
      .filter(_.partitionValues.get("p").contains("1")).map(_.path).toSet
    assert(post == pre, "files outside the WHERE partition are untouched")
    // graft-native has no partition-scoped compaction: loud refusal
    val err = intercept[Exception](
      spark.sql("CALL graft.system.compact('dbmp.tg', `where` => 'p=0')").collect())
    assert(err.getMessage.contains("partition-scoped"))
  }

  test("CALL vacuum / expire_snapshots / rewrite_manifests dispatch per format; refusals loud") {
    import spark.implicits._
    val whd = wh("dbmv"); Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbmv")
    // iceberg: orphan + manifests + snapshot expiry
    val ip = whd.resolve("ti").toString
    (0 until 4).foreach(i => Iceberg.write(Seq((i.toLong, i.toString)).toDF("k", "v"), ip,
      mode = if (i == 0) SaveMode.Overwrite else SaveMode.Append))
    java.nio.file.Files.write(Paths.get(ip, "data", "orphan.parquet"), Array[Byte](1))
    val removed = spark.sql(
      "CALL graft.system.vacuum('dbmv.ti', older_than_hours => -1)").collect().head.getLong(0)
    assert(removed >= 1 && !Paths.get(ip, "data", "orphan.parquet").toFile.exists)
    val rw = spark.sql("CALL graft.system.rewrite_manifests('dbmv.ti')").collect().head
    assert(rw.getLong(0) == 4L && rw.getLong(1) == 1L,
      s"manifests 4 -> 1, got ${rw.getLong(0)} -> ${rw.getLong(1)}")
    spark.sql("CALL graft.system.expire_snapshots('dbmv.ti', keep_last => 1)").collect()
    assert(Iceberg.snapshots(ip).size == 1)
    assert(spark.table("graft.dbmv.ti").count() == 4L)
    // delta: the DEFAULT 7-day retention PROTECTS a freshly-dead file
    // (an explicitly requested window must never silently become an
    // immediate reclaim that breaks time travel)...
    val dp = whd.resolve("td").toString
    DeltaLake.write(Seq((1L, "a")).toDF("k", "v"), dp)
    java.nio.file.Files.write(Paths.get(dp, "orphan.parquet"), Array[Byte](1))
    assert(spark.sql("CALL graft.system.vacuum('dbmv.td')").collect()
      .head.getLong(0) == 0L,
      "default retention must spare a seconds-old unreferenced file")
    assert(Paths.get(dp, "orphan.parquet").toFile.exists)
    // ...and the explicit no-retention sentinel reclaims it
    assert(spark.sql("CALL graft.system.vacuum('dbmv.td', older_than_hours => -1)")
      .collect().head.getLong(0) >= 1L)
    assert(!Paths.get(dp, "orphan.parquet").toFile.exists)
    // delta has no expire_snapshots: loud refusal, not a silent no-op
    val err = intercept[Exception](
      spark.sql("CALL graft.system.expire_snapshots('dbmv.td')").collect())
    assert(err.getMessage.contains("not implemented for delta"))
    val err2 = intercept[Exception](
      spark.sql("CALL graft.system.rewrite_manifests('dbmv.td')").collect())
    assert(err2.getMessage.contains("iceberg only"))
    // graft-native: expire_snapshots == version vacuum. Full-snapshot
    // commits (not appends) so expired versions' dirs are actually
    // unreferenced — an append chain carries old files by reference
    // and vacuum rightly spares their dirs.
    val gp = whd.resolve("tg").toString
    Versioned.commit(Seq((1L, "a")).toDF("k", "v"), gp)
    Versioned.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), gp)
    Versioned.commit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), gp)
    spark.sql("CALL graft.system.expire_snapshots('dbmv.tg', keep_last => 1)").collect()
    assert(Versioned.versions(gp) == Seq(3L))
    assert(spark.table("graft.dbmv.tg").count() == 3L)
    // unknown procedure refuses with the available list
    val err3 = intercept[Exception](
      spark.sql("CALL graft.system.nope('dbmv.tg')").collect())
    assert(err3.getMessage.contains("system.compact") ||
      err3.getMessage.contains("FAILED_TO_LOAD_ROUTINE"),
      s"unknown procedure must refuse loudly, got: ${err3.getMessage.take(120)}")
  }

  test("CALL analyze_table / replace_partition_spec: iceberg dispatch, loud refusals elsewhere") {
    import spark.implicits._
    val whd = wh("dbms"); Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbms")
    val ip = whd.resolve("ti").toString
    Iceberg.write((1 to 40).map(i => (i.toLong, s"g${i % 4}",
      java.time.LocalDateTime.of(2024, 1 + i % 3, 1, 0, 0))).toDF("k", "grp", "ts"), ip,
      partitionBy = Seq("years(ts)"))
    // analyze: one row per sketchable column, ndv exact at this scale
    val ndv = spark.sql("CALL graft.system.analyze_table('dbms.ti')").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ndv == Map("k" -> 40L, "grp" -> 4L, "ts" -> 3L), ndv.toString)
    assert(Iceberg.readTableStatistics(spark, ip) == ndv)
    // spec evolution from SQL: coarse -> fine, pure metadata
    val pre = Iceberg.snapshot(spark, ip).files.map(_.path).toSet
    val sid = spark.sql(
      "CALL graft.system.replace_partition_spec('dbms.ti', partition_by => 'months(ts)')")
      .collect().head.getLong(0)
    assert(sid == 1L)
    assert(Iceberg.snapshot(spark, ip).files.map(_.path).toSet == pre,
      "replace_partition_spec must move zero data files")
    // delta ANALYZE dispatches to the graft.statistics domain (r13);
    // graft-native still refuses (the Spark catalog's ANALYZE path)
    val dp = whd.resolve("td").toString
    DeltaLake.write(Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("k", "v"), dp)
    val dndv = spark.sql("CALL graft.system.analyze_table('dbms.td')").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dndv == Map("k" -> 3L, "v" -> 2L), dndv.toString)
    val gp2 = whd.resolve("tg2").toString
    Versioned.commit(Seq((1L, "a")).toDF("k", "v"), gp2)
    val e1 = intercept[Exception](
      spark.sql("CALL graft.system.analyze_table('dbms.tg2')").collect())
    assert(e1.getMessage.contains("no statistics layer"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("CALL graft.system.replace_partition_spec('dbms.td', partition_by => 'k')")
        .collect())
    assert(e2.getMessage.contains("iceberg only"), e2.getMessage)
  }

  test("CALL create_ref / drop_ref / fast_forward: the refs layer from SQL") {
    import spark.implicits._
    val whd = wh("dbref"); Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbref")
    val ip = whd.resolve("ti").toString
    Iceberg.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), ip)
    // tag the current snapshot (snapshot_id defaulted), then pin-check
    val pinned = spark.sql(
      "CALL graft.system.create_ref('dbref.ti', name => 'audit')").collect().head.getLong(0)
    assert(Iceberg.refs(ip)("audit") == ((pinned, "tag")))
    // stage onto a branch, publish via fast_forward — the WAP loop
    spark.sql("CALL graft.system.create_ref('dbref.ti', name => 'stage', type => 'branch')")
      .collect()
    Iceberg.write(Seq((3L, "c")).toDF("k", "v"), ip,
      mode = SaveMode.Append, toBranch = Some("stage"))
    assert(spark.table("graft.dbref.ti").count() == 2L,
      "main's readers must not see the staged branch write")
    spark.sql("CALL graft.system.fast_forward('dbref.ti', branch => 'stage')").collect()
    assert(spark.table("graft.dbref.ti").count() == 3L,
      "fast_forward publishes the branch head to main")
    spark.sql("CALL graft.system.drop_ref('dbref.ti', name => 'stage')").collect()
    assert(!Iceberg.refs(ip).contains("stage") && Iceberg.refs(ip).contains("audit"))
    // refusals: duplicate ref, unknown ref, non-iceberg format
    val e1 = intercept[Exception](spark.sql(
      "CALL graft.system.create_ref('dbref.ti', name => 'audit')").collect())
    assert(e1.getMessage.contains("already exists"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "CALL graft.system.drop_ref('dbref.ti', name => 'nope')").collect())
    assert(e2.getMessage.contains("no ref"), e2.getMessage)
    val dp = whd.resolve("td").toString
    DeltaLake.write(Seq((1L, "a")).toDF("k", "v"), dp)
    val e3 = intercept[Exception](spark.sql(
      "CALL graft.system.create_ref('dbref.td', name => 't')").collect())
    assert(e3.getMessage.contains("no named-ref layer"), e3.getMessage)
  }

  test("CALL maintain_clustered: delta incremental fold from SQL; graft needs cluster_col") {
    import spark.implicits._
    val whd = wh("dbmc"); Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbmc")
    val dp = whd.resolve("td").toString
    DeltaLake.write((1L to 2000L).map(k => (k, s"r$k")).toDF("k", "v"), dp)
    DeltaLake.enableClustering(spark, dp, Seq("k"))
    DeltaLake.optimizeCluster(spark, dp, nFiles = 4)
    val clean = DeltaLake.snapshot(spark, dp).files.map(_.path).toSet
    // within budget: -1, untouched
    assert(spark.sql("CALL graft.system.maintain_clustered('dbmc.td')")
      .head().getLong(0) == -1L)
    (0 until 6).foreach { i =>
      DeltaLake.write((1L to 2000L by 53L).map(k => (k + i, s"s$k")).toDF("k", "v")
        .coalesce(1), dp, mode = SaveMode.Append)
    }
    val v = spark.sql("CALL graft.system.maintain_clustered('dbmc.td')").head().getLong(0)
    assert(v > 0, s"6 stragglers must trip the default budget, got $v")
    assert(clean.subsetOf(DeltaLake.snapshot(spark, dp).files.map(_.path).toSet),
      "clean files must carry by reference through the SQL surface")
    // graft-native needs the column named; delta refuses it
    val gp = whd.resolve("tg").toString
    Versioned.commitClustered((1L to 2000L).map(k => (k, k * 2)).toDF("k", "v"), gp,
      clusterCol = "k", nFiles = 4)
    (0 until 6).foreach { i =>
      Versioned.appendCommit((1L to 2000L by 53L).map(k => (k + i, k)).toDF("k", "v")
        .coalesce(1), gp)
    }
    assert(spark.sql(
      "CALL graft.system.maintain_clustered('dbmc.tg', cluster_col => 'k')")
      .head().getLong(0) > 0)
    intercept[Exception](spark.sql(
      "CALL graft.system.maintain_clustered('dbmc.tg')").collect())
    intercept[Exception](spark.sql(
      "CALL graft.system.maintain_clustered('dbmc.td', cluster_col => 'k')").collect())
  }

  test("CALL rollback_to_snapshot restores all three formats; bad targets refuse") {
    import spark.implicits._
    val whd = wh("dbmr"); Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbmr")
    def rows(n: Int) = (1 to n).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    // delta: version selector, then timestamp selector back to head
    val dp = whd.resolve("td").toString
    DeltaLake.write(rows(3), dp)
    DeltaLake.write(rows(2), dp, mode = SaveMode.Append)
    val headTs = System.currentTimeMillis() + 60000
    val r1 = spark.sql("CALL graft.system.rollback_to_snapshot('dbmr.td', version => 0)")
      .collect().head.getLong(0)
    assert(r1 == 0L && spark.table("graft.dbmr.td").count() == 3L,
      "delta restore to v0 must drop the appended rows")
    // timestamp as-of resolves to the newest commit ≤ ts — the restore
    // commit itself, whose content is v0's (restore never loses history)
    spark.sql(s"CALL graft.system.rollback_to_snapshot('dbmr.td', timestamp_ms => $headTs)")
      .collect()
    assert(spark.table("graft.dbmr.td").count() == 3L)
    // iceberg: snapshot-id selector; data files come back by reference
    val ip = whd.resolve("ti").toString
    Iceberg.write(rows(3), ip)
    val firstSnap = Iceberg.snapshot(spark, ip).snapshotId
    Iceberg.write(rows(4), ip, mode = SaveMode.Append)
    spark.sql(s"CALL graft.system.rollback_to_snapshot('dbmr.ti', version => $firstSnap)")
      .collect()
    assert(spark.table("graft.dbmr.ti").count() == 3L)
    assert(Iceberg.snapshot(spark, ip).snapshotId == firstSnap)
    // graft-native: version selector; the restore is a NEW commit
    val gp = whd.resolve("tg").toString
    Versioned.commit(rows(3), gp)
    Versioned.appendCommit(rows(2), gp)
    spark.sql("CALL graft.system.rollback_to_snapshot('dbmr.tg', version => 1)").collect()
    assert(spark.table("graft.dbmr.tg").count() == 3L)
    assert(Versioned.currentVersion(gp).contains(3L),
      "graft restore publishes a new commit; history is never rewritten")
    // refusals: unknown target, both selectors, neither selector
    val e1 = intercept[Exception](spark.sql(
      "CALL graft.system.rollback_to_snapshot('dbmr.ti', version => 999)").collect())
    assert(e1.getMessage.contains("not in the history"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "CALL graft.system.rollback_to_snapshot('dbmr.td', version => 0, timestamp_ms => 1)")
      .collect())
    assert(e2.getMessage.contains("exactly one"), e2.getMessage)
    val e3 = intercept[Exception](spark.sql(
      "CALL graft.system.rollback_to_snapshot('dbmr.td')").collect())
    assert(e3.getMessage.contains("exactly one"), e3.getMessage)
    val e4 = intercept[Exception](spark.sql(
      "CALL graft.system.rollback_to_snapshot('dbmr.tg', version => 999)").collect())
    assert(e4.getMessage.contains("not committed"), e4.getMessage)
  }

  test("CALL rewrite_table_path copies an iceberg table under a new name; refusals loud") {
    import spark.implicits._
    val whd = wh("dbrt"); Writers.deleteTree(whd)
    spark.sql("DROP NAMESPACE IF EXISTS graft.dbrt CASCADE")
    spark.sql("CREATE NAMESPACE graft.dbrt")
    val src = whd.resolve("ti").toString
    Iceberg.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), src)
    Iceberg.write(Seq((3L, "c")).toDF("k", "v"), src, mode = SaveMode.Append)
    val res = spark.sql("CALL graft.system.rewrite_table_path('dbrt.ti', target => 'dbrt.ti_dr')")
      .collect()
    assert(res.length == 1)
    // the copy serves under its catalog NAME, self-contained, and
    // diverges independently of the source
    assert(spark.table("graft.dbrt.ti_dr").count() == 3L)
    spark.sql("INSERT INTO graft.dbrt.ti_dr VALUES (9, 'z')")
    assert(spark.table("graft.dbrt.ti_dr").count() == 4L)
    assert(spark.table("graft.dbrt.ti").count() == 3L, "source must not see copy commits")
    // non-iceberg formats refuse (their metadata is table-relative)
    DeltaLake.write(Seq((1L, "a")).toDF("k", "v"), whd.resolve("td").toString)
    val e = intercept[Exception](spark.sql(
      "CALL graft.system.rewrite_table_path('dbrt.td', target => 'dbrt.td_dr')").collect())
    assert(e.getMessage.contains("table-relative"), e.getMessage)
  }
}
