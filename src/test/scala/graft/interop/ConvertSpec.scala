package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class ConvertSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def dataFiles(path: String): Set[String] = {
    val st = Files.walk(Paths.get(path))
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.map(_.toString)
        .filter(f => f.endsWith(".parquet") && !f.contains("_delta_log") &&
          !f.contains("/metadata/")).toSet
    } finally st.close()
  }

  test("deltaToIceberg publishes metadata over the same files; both stacks read") {
    import spark.implicits._
    val path = freshDir("conv_d2i")
    DeltaLake.write(
      Seq((1L, "a", "F"), (2L, "b", "O"), (3L, "c", "F")).toDF("k", "v", "status"),
      path, partitionBy = Seq("status"))
    val before = dataFiles(path)
    Convert.deltaToIceberg(spark, path)
    assert(dataFiles(path) == before, "conversion must not write data files")
    // both stacks serve identical rows
    val viaDelta = DeltaLake.read(spark, path).as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    val viaIceberg = Iceberg.read(spark, path).as[(Long, String, String)]
      .collect().sortBy(_._1).toSeq
    assert(viaDelta == viaIceberg && viaDelta.map(_._1) == Seq(1L, 2L, 3L))
    // partition pruning works through the converted manifests
    assert(Iceberg.read(spark, path).filter(col("status") === "O").count() == 1L)
    val (kept, total) = org.apache.spark.sql.graft.VersionedFileIndex.lastPlanned(path).get
    assert(kept < total, s"converted Iceberg metadata must prune ($kept/$total)")
    // the name mapping property is recorded (converted files carry no ids)
    val meta = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      new String(Files.readAllBytes(Paths.get(path, "metadata", "v00001.metadata.json")),
        "UTF-8"))
    assert(meta.get("properties").hasNonNull("schema.name-mapping.default"))
    // an ICEBERG append after conversion mixes id-carrying new files
    // with id-less converted ones — name resolution covers both
    Seq((4L, "d", "O")).toDF("k", "v", "status")
      .write.format("iceberg").mode("append").save(path)
    assert(Iceberg.read(spark, path).count() == 4L)
    assert(Iceberg.read(spark, path).filter(col("status") === "O").count() == 2L)
    // Iceberg MAINTENANCE on the converted table must not destroy the
    // co-located Delta layer: neither its log files NOR data files
    // only the Delta log references (a Delta-side append after the
    // conversion, invisible to every Iceberg manifest)
    DeltaLake.write(Seq((7L, "g", "F")).toDF("k", "v", "status"), path,
      mode = SaveMode.Append)
    Iceberg.removeOrphanFiles(spark, path, System.currentTimeMillis() + 1000L)
    assert(DeltaLake.read(spark, path).count() == 4L,
      "orphan cleanup must never eat the co-located Delta layer's files")
    // renameColumn refuses on a name-mapped table: the converted files
    // carry no field ids, so a rename could only misread as NULLs
    val eRn = intercept[IllegalArgumentException](
      Iceberg.renameColumn(spark, path, "v", "v2"))
    assert(eRn.getMessage.contains("NAME MAPPING"))
    // deletion-vector debt refuses (the files over-serve deleted rows)
    val p2 = freshDir("conv_d2i_dv")
    DeltaLake.write(spark.range(0, 50).selectExpr("id AS k", "id % 3 AS v"), p2)
    DeltaLake.deleteMergeOnRead(spark, p2, col("k") === 7L)
    val e = intercept[IllegalArgumentException](Convert.deltaToIceberg(spark, p2))
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("resync rebuilds a stale layer from the current native state") {
    import spark.implicits._
    val path = freshDir("conv_resync")
    DeltaLake.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    Convert.deltaToIceberg(spark, path)
    // delta-side writes leave the Iceberg layer stale
    DeltaLake.write(Seq((3L, "c")).toDF("k", "v"), path, mode = SaveMode.Append)
    assert(Iceberg.read(spark, path).count() == 2L, "stale by design until resync")
    val before = dataFiles(path)
    Convert.resyncIceberg(spark, path)
    assert(dataFiles(path) == before, "resync must be metadata-only")
    assert(Iceberg.read(spark, path).count() == 3L)
    assert(DeltaLake.read(spark, path).count() == 3L)
  }

  test("the partitions inspection table summarizes the current layout") {
    import spark.implicits._
    val path = freshDir("ice_partitions")
    Seq((1L, "F"), (2L, "F"), (3L, "O")).toDF("k", "status")
      .repartition(2).write.format("iceberg").partitionBy("status").save(path)
    val parts = spark.read.format("iceberg").option("partitions", "true").load(path)
      .orderBy("partition").collect()
    assert(parts.map(_.getString(0)).toSeq == Seq("status=F", "status=O"))
    assert(parts.map(_.getLong(2)).sum == 3L, "record counts must sum to the table")
  }

  test("icebergToDelta publishes a v0 log over the same files; both stacks read") {
    import spark.implicits._
    val path = freshDir("conv_i2d")
    Seq((1L, "x", 10L), (2L, "y", 20L)).toDF("k", "v", "p")
      .write.format("iceberg").partitionBy("p").save(path)
    Seq((3L, "z", 10L)).toDF("k", "v", "p")
      .write.format("iceberg").mode("append").save(path)
    val before = dataFiles(path)
    Convert.icebergToDelta(spark, path)
    assert(dataFiles(path) == before, "conversion must not write data files")
    val viaDelta = DeltaLake.read(spark, path).as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    val viaIceberg = Iceberg.read(spark, path).as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq
    assert(viaDelta == viaIceberg && viaDelta.size == 3)
    // partition pruning through the converted Delta log
    assert(DeltaLake.read(spark, path).filter(col("p") === 20L).count() == 1L)
    val (kept, total) = org.apache.spark.sql.graft.VersionedFileIndex.lastPlanned(path).get
    assert(kept < total, s"converted Delta metadata must prune ($kept/$total)")
    // numRecords stats came across from the manifests
    val snap = DeltaLake.snapshot(spark, path)
    assert(snap.files.forall(_.stats.exists(_.contains("numRecords"))))
    // a DELTA append after conversion lands through the log
    DeltaLake.write(Seq((4L, "w", 20L)).toDF("k", "v", "p"), path, mode = SaveMode.Append)
    assert(DeltaLake.read(spark, path).count() == 4L)
    // a transform-partitioned table refuses (no Delta equivalent)
    val p2 = freshDir("conv_i2d_bucket")
    Iceberg.write(spark.range(0, 20).selectExpr("id AS k", "CAST(id AS STRING) AS v"),
      p2, partitionBy = Seq("bucket(4, k)"))
    val e = intercept[IllegalArgumentException](Convert.icebergToDelta(spark, p2))
    assert(e.getMessage.contains("transform"))
  }

  test("continuous sync Delta->Iceberg: each commit mirrors, history preserved, zero data files") {
    import spark.implicits._
    val path = freshDir("conv_sync_d2i")
    DeltaLake.write((1L to 20L).map(k => (k, s"v$k")).toDF("k", "v"), path)
    Convert.deltaToIceberg(spark, path)
    val s1 = Iceberg.snapshot(spark, path).snapshotId
    def bothEqual(): Unit = {
      val d = DeltaLake.read(spark, path).collect().map(_.toSeq).toSet
      val i = Iceberg.read(spark, path).collect().map(_.toSeq).toSet
      assert(d == i, s"layers diverged:\n delta=$d\n iceberg=$i")
    }
    // commit 1: append
    DeltaLake.write(Seq((21L, "v21")).toDF("k", "v"), path, mode = SaveMode.Append)
    val before1 = dataFiles(path)
    assert(Convert.syncIceberg(spark, path).nonEmpty)
    assert(dataFiles(path) == before1, "sync must write zero data files")
    bothEqual()
    // commit 2: copy-on-write delete (files added AND removed)
    DeltaLake.deleteWhere(spark, path, col("k") % 5 === 0)
    assert(Convert.syncIceberg(spark, path).nonEmpty)
    bothEqual()
    assert(Iceberg.read(spark, path).count() == 17L)
    // commit 3: additive schema change + data
    DeltaLake.addColumn(spark, path, "score", org.apache.spark.sql.types.DoubleType)
    DeltaLake.write(Seq((100L, "x", 0.5)).toDF("k", "v", "score"), path,
      mode = SaveMode.Append)
    assert(Convert.syncIceberg(spark, path).nonEmpty)
    assert(Iceberg.read(spark, path).columns.toSeq == Seq("k", "v", "score"),
      "the Iceberg schema must gain the added column")
    bothEqual()
    // HISTORY preserved on both sides: the conversion-time snapshot is
    // still in the log and still time-travels
    val snapIds = Iceberg.snapshots(path).map(_._1)
    assert(snapIds.head == s1 && snapIds.size >= 4,
      s"sync must append snapshots, not rewrite history (got $snapIds)")
    assert(Iceberg.read(spark, path, snapshotId = Some(s1)).count() == 20L,
      "the pre-sync snapshot must still time-travel")
    // idempotent: nothing to sync -> no new snapshot
    assert(Convert.syncIceberg(spark, path).isEmpty)
    // non-additive source changes refuse loudly
    DeltaLake.write(Seq((1L, "y")).toDF("k", "v"), path) // overwrite drops score
    val eDrop = intercept[IllegalArgumentException](Convert.syncIceberg(spark, path))
    assert(eDrop.getMessage.contains("additive"))
  }

  test("continuous sync Iceberg->Delta: mirror direction; delete debt refuses until compacted") {
    import spark.implicits._
    val path = freshDir("conv_sync_i2d")
    Iceberg.write((1L to 10L).map(k => (k, k % 3)).toDF("k", "grp"), path)
    Convert.icebergToDelta(spark, path)
    Iceberg.write(Seq((11L, 2L)).toDF("k", "grp"), path, mode = SaveMode.Append)
    assert(Convert.syncDelta(spark, path).nonEmpty)
    assert(DeltaLake.read(spark, path).count() == 11L)
    assert(DeltaLake.read(spark, path).collect().map(_.toSeq).toSet ==
      Iceberg.read(spark, path).collect().map(_.toSeq).toSet)
    // Delta history preserved: version advanced by exactly one commit
    assert(DeltaLake.snapshot(spark, path).version == 1L)
    // outstanding Iceberg position deletes refuse the sync loudly...
    Iceberg.deleteMergeOnRead(spark, path, col("k") === 4L)
    val eDebt = intercept[IllegalArgumentException](Convert.syncDelta(spark, path))
    assert(eDebt.getMessage.contains("delete"))
    // ...and folding the debt makes the sync land the net state
    Iceberg.compact(spark, path)
    assert(Convert.syncDelta(spark, path).nonEmpty)
    assert(DeltaLake.read(spark, path).count() == 10L)
    assert(DeltaLake.read(spark, path).collect().map(_.toSeq).toSet ==
      Iceberg.read(spark, path).collect().map(_.toSeq).toSet)
    assert(Convert.syncDelta(spark, path).isEmpty)
  }

  test("sync onto a v3 Iceberg mirror: mirrored rows take fresh inherited row ids") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val path = freshDir("conv_sync_v3")
    DeltaLake.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), path)
    Convert.deltaToIceberg(spark, path)
    // the mirror layer upgrades to v3 (row lineage on the Iceberg side)
    Iceberg.upgradeToV3(spark, path)
    // a Delta append syncs as ONE v3 snapshot whose rows get ids
    DeltaLake.write(Seq((3L, "c"), (4L, "d")).toDF("k", "v").coalesce(1), path,
      mode = org.apache.spark.sql.SaveMode.Append)
    assert(Convert.syncIceberg(spark, path).nonEmpty)
    assert(Iceberg.read(spark, path).count() == 4L)
    // the mirrored rows serve FRESH inherited row ids (0-based range
    // starting at the upgrade-time next-row-id = 0, advanced by 2)
    val lineage = Iceberg.readWithRowLineage(spark, path)
      .select(col("k"), col("_row_id")).as[(Long, Option[Long])]
      .collect().toMap
    assert(lineage(3L).nonEmpty && lineage(4L).nonEmpty,
      "mirrored rows must carry inherited row ids")
    assert(Set(lineage(3L).get, lineage(4L).get).size == 2)
    // pre-upgrade files keep null lineage (the spec's upgraded shape)
    assert(lineage(1L).isEmpty && lineage(2L).isEmpty)
    // a Delta COW delete syncs as a v3 overwrite; row set tracks
    DeltaLake.deleteWhere(spark, path, col("k") === 3L)
    assert(Convert.syncIceberg(spark, path).nonEmpty)
    assert(Iceberg.read(spark, path).as[(Long, String)].collect().map(_._1).sorted.toSeq ==
      Seq(1L, 2L, 4L))
    assert(Convert.syncIceberg(spark, path).isEmpty, "in-sync must no-op")
  }

  test("sync onto a row-tracked Delta mirror: mirrored adds take fresh baseRowId ranges") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val path = freshDir("conv_sync_rt")
    Iceberg.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), path)
    Convert.icebergToDelta(spark, path)
    DeltaLake.enableRowTracking(spark, path)
    val hwm0 = DeltaLake.snapshot(spark, path).rowIdHighWaterMark
    assert(hwm0 == 1L, "backfill assigns one id per existing row")
    // an Iceberg append syncs as ONE Delta commit with assigned ids
    Iceberg.write(Seq((3L, "c"), (4L, "d")).toDF("k", "v").coalesce(1), path,
      mode = org.apache.spark.sql.SaveMode.Append)
    assert(Convert.syncDelta(spark, path).nonEmpty)
    val snap = DeltaLake.snapshot(spark, path)
    assert(snap.rowIdHighWaterMark == 3L,
      "the sync commit must ratchet the watermark by the mirrored rows")
    assert(snap.files.forall(_.baseRowId.nonEmpty),
      "every live file (mirrored included) must carry a baseRowId range")
    val tracked = DeltaLake.readWithRowTracking(spark, path)
      .select(col("k"), col("_row_id")).as[(Long, Long)].collect().toMap
    assert(tracked.size == 4 && tracked.values.toSet.size == 4,
      "every row serves a unique row id after the sync")
    assert(Convert.syncDelta(spark, path).isEmpty, "in-sync must no-op")
  }
}
