package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

class DeltaLakeSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  test("unpartitioned round trip; the log is spec-shaped JSON") {
    import spark.implicits._
    val path = freshDir("delta_rt")
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    assert(DeltaLake.write(df, path) == 0L)
    val got = DeltaLake.read(spark, path).as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the v0 commit must carry protocol + metaData + adds, one JSON object per line
    val log = new String(java.nio.file.Files.readAllBytes(
      Paths.get(path, "_delta_log", "0" * 20 + ".json")), "UTF-8")
    val lines = log.split('\n').filter(_.nonEmpty).map(
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(_))
    assert(lines.exists(n => n.has("protocol") &&
      n.get("protocol").get("minReaderVersion").asInt == 1))
    val meta = lines.find(_.has("metaData")).get.get("metaData")
    assert(meta.get("format").get("provider").asText == "parquet")
    assert(meta.has("schemaString") && meta.has("partitionColumns") && meta.has("id"))
    val adds = lines.filter(_.has("add"))
    assert(adds.nonEmpty)
    adds.foreach { a =>
      val ad = a.get("add")
      assert(ad.has("path") && ad.has("partitionValues") && ad.has("size") &&
        ad.get("dataChange").asBoolean)
      val st = new com.fasterxml.jackson.databind.ObjectMapper().readTree(ad.get("stats").asText)
      assert(st.get("numRecords").asLong > 0L)
      assert(st.get("minValues").has("k") && st.get("maxValues").has("v"))
    }
  }

  test("partitioned write: append accumulates, overwrite removes, partition filters prune files") {
    import spark.implicits._
    val path = freshDir("delta_part")
    val a = Seq((1L, "x", "F"), (2L, "y", "O")).toDF("k", "v", "status")
    val b = Seq((3L, "z", "F")).toDF("k", "v", "status")
    DeltaLake.write(a, path, partitionBy = Seq("status"))
    DeltaLake.write(b, path, partitionBy = Seq("status"), mode = SaveMode.Append)
    assert(DeltaLake.read(spark, path).count() == 3L)
    // partition pruning through the shared FileIndex: only F files planned
    val f = DeltaLake.read(spark, path).filter(col("status") === "F")
    assert(f.count() == 2L)
    val (kept, total) = org.apache.spark.sql.graft.VersionedFileIndex.lastPlanned(path).get
    assert(kept < total, s"partition filter must prune Delta files at planning ($kept/$total)")
    // overwrite: old files removed from the live set
    DeltaLake.write(Seq((9L, "w", "P")).toDF("k", "v", "status"), path,
      partitionBy = Seq("status"), mode = SaveMode.Overwrite)
    val after = DeltaLake.read(spark, path).as[(Long, String, String)].collect()
    assert(after.toSeq == Seq((9L, "w", "P")))
    // time travel: version 0 still serves the original two rows
    assert(DeltaLake.read(spark, path, versionAsOf = Some(0L)).count() == 2L)
  }

  test("stats skipping prunes data files on a value predicate") {
    import spark.implicits._
    val path = freshDir("delta_stats")
    // 4 disjoint key-range files
    val df = spark.range(0, 400).select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(4, col("k"))
    DeltaLake.write(df, path)
    val probe = DeltaLake.read(spark, path).filter(col("k") === 42L)
    assert(probe.count() == 1L)
    val (kept, total) = org.apache.spark.sql.graft.VersionedFileIndex.lastPlanned(path).get
    assert(total >= 4 && kept < total,
      s"translated Delta min/max stats must skip whole files ($kept/$total)")
  }

  test("checkpoint folds the log: reads survive vacuuming the folded JSON commits") {
    import spark.implicits._
    val path = freshDir("delta_cp")
    DeltaLake.write(Seq((0L, "r0")).toDF("k", "v"), path)
    for (i <- 1 to 3)
      DeltaLake.write(Seq((i.toLong, s"r$i")).toDF("k", "v"), path, mode = SaveMode.Append)
    assert(DeltaLake.checkpoint(spark, path) == 3L)
    // retention vacuum: the folded JSON files can disappear
    for (v <- 0L to 3L)
      java.nio.file.Files.delete(Paths.get(path, "_delta_log", f"$v%020d.json"))
    assert(DeltaLake.read(spark, path).count() == 4L, "checkpoint-only read must work")
    // and the log keeps growing above the checkpoint
    DeltaLake.write(Seq((4L, "r4")).toDF("k", "v"), path, mode = SaveMode.Append)
    DeltaLake.write(Seq((5L, "r5")).toDF("k", "v"), path, mode = SaveMode.Append)
    assert(DeltaLake.read(spark, path).as[(Long, String)].collect().sortBy(_._1).length == 6)
    // a gap ABOVE the checkpoint (v4 lost, v5 present) still fails loudly
    java.nio.file.Files.delete(Paths.get(path, "_delta_log", f"${4L}%020d.json"))
    val e = intercept[IllegalArgumentException](DeltaLake.read(spark, path).count())
    assert(e.getMessage.contains("gap"))
  }

  test("vacuum retention tracks the remove-action deletionTimestamp, not file mtime") {
    import spark.implicits._
    val path = freshDir("delta_vac_ts")
    DeltaLake.write(Seq((1L, "a")).toDF("k", "v"), path)
    val dead = Paths.get(path).toFile.listFiles
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSet
    // overwrite: the v0 file becomes unreferenced NOW (its remove
    // action's deletionTimestamp is fresh) — but backdate its mtime 30
    // days, the OPTIMIZE/rewrite shape the retention contract protects
    DeltaLake.write(Seq((2L, "b")).toDF("k", "v"), path, mode = SaveMode.Overwrite)
    val monthAgo = System.currentTimeMillis() - 30L * 24 * 3600 * 1000
    dead.foreach(n => assert(Paths.get(path, n).toFile.setLastModified(monthAgo)))
    // an orphan (no tombstone in the log) with the same old mtime
    // must still fall back to mtime and be reclaimed
    java.nio.file.Files.write(Paths.get(path, "orphan.parquet"), Array[Byte](1))
    assert(Paths.get(path, "orphan.parquet").toFile.setLastModified(monthAgo))
    val sevenDays = System.currentTimeMillis() - 7L * 24 * 3600 * 1000
    assert(DeltaLake.vacuum(spark, path, olderThanMs = sevenDays) == 1,
      "only the untracked orphan is past retention; the freshly-removed file is not")
    dead.foreach(n => assert(Paths.get(path, n).toFile.exists,
      s"$n was removed one commit ago — a 7-day window must spare it despite old mtime"))
    assert(!Paths.get(path, "orphan.parquet").toFile.exists)
    // ageless vacuum still reclaims the dead file
    assert(DeltaLake.vacuum(spark, path) == dead.size)
  }

  test("special and null partition values round-trip through the hive escaping") {
    import spark.implicits._
    val path = freshDir("delta_esc")
    val df = Seq((1L, "a/b c"), (2L, "p%q=r"), (3L, null.asInstanceOf[String]))
      .toDF("k", "part")
    DeltaLake.write(df, path, partitionBy = Seq("part"))
    val got = DeltaLake.read(spark, path).as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a/b c"), (2L, "p%q=r"), (3L, null)))
    // and the log records the RAW values (escaping is a path concern only)
    val s = DeltaLake.snapshot(spark, path)
    val pvs = s.files.map(_.partitionValues("part")).toSet
    assert(pvs == Set(Some("a/b c"), Some("p%q=r"), None))
  }

  test("reader protocol gate: minReaderVersion 3 fails loudly instead of misreading") {
    import spark.implicits._
    val path = freshDir("delta_gate")
    DeltaLake.write(Seq((1L, "a")).toDF("k", "v"), path)
    // hand-raise the protocol as a foreign writer with reader features would
    val log = Paths.get(path, "_delta_log", f"${1L}%020d.json")
    java.nio.file.Files.write(log,
      """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,"readerFeatures":["collations"]}}"""
        .getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](DeltaLake.read(spark, path).count())
    assert(e.getMessage.contains("collations"))
  }

  test("column-mapped (name mode) foreign tables read, write, and stream") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val path = freshDir("delta_colmap")
    // hand-craft a mapped table exactly as a foreign Delta writer lays
    // it out: data files + partition dirs under PHYSICAL names...
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("col-aaa", "col-bbb", "col-ccc")
      .repartition(2).write.partitionBy("col-ccc").parquet(path)
    def fld(name: String, dt: DataType, phys: String, id: Int) =
      StructField(name, dt, nullable = true, new MetadataBuilder()
        .putLong("delta.columnMapping.id", id.toLong)
        .putString("delta.columnMapping.physicalName", phys).build())
    val logical = StructType(Seq(fld("k", LongType, "col-aaa", 1),
      fld("v", StringType, "col-bbb", 2), fld("p", LongType, "col-ccc", 3)))
    // ...and a log whose schemaString carries the mapping metadata
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val lines = scala.collection.mutable.ArrayBuffer(
      """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""")
    val metaNode = om.createObjectNode()
    val md = metaNode.putObject("metaData")
    md.put("id", "t1"); md.put("schemaString", logical.json)
    md.putObject("format").put("provider", "parquet")
    md.putArray("partitionColumns").add("p")
    md.putObject("configuration").put("delta.columnMapping.mode", "name")
    md.put("createdTime", 1L)
    lines += om.writeValueAsString(metaNode)
    for (pv <- Seq(10L, 20L)) {
      val dir = Paths.get(path, s"col-ccc=$pv")
      val dataFile = java.nio.file.Files.list(dir).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      val rel = s"col-ccc=$pv/${Paths.get(dataFile).getFileName}"
      val addNode = om.createObjectNode()
      val add = addNode.putObject("add")
      add.put("path", rel)
      add.putObject("partitionValues").put("col-ccc", pv.toString)
      add.put("size", java.nio.file.Files.size(Paths.get(dataFile)))
      add.put("modificationTime", 1L); add.put("dataChange", true)
      lines += om.writeValueAsString(addNode)
    }
    java.nio.file.Files.createDirectories(Paths.get(path, "_delta_log"))
    java.nio.file.Files.write(Paths.get(path, "_delta_log", f"${0L}%020d.json"),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    // reads serve the LOGICAL schema with the physical files' values
    val got = DeltaLake.read(spark, path)
    assert(got.schema.fieldNames.toSeq == Seq("k", "v", "p"))
    assert(got.as[(Long, String, Long)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a", 10L), (2L, "b", 20L)))
    // partition pruning still fires (the log speaks physical throughout)
    assert(got.filter(col("p") === 10L).count() == 1L)
    val (kept, total) = org.apache.spark.sql.graft.VersionedFileIndex.lastPlanned(path).get
    assert(kept < total, s"partition filter must prune a mapped table too ($kept/$total)")
    // SQL surface shows logical names only
    val sqlDf = spark.read.format("delta").load(path)
    assert(sqlDf.schema.fieldNames.toSeq == Seq("k", "v", "p"))
    assert(sqlDf.filter(col("v") === "b").count() == 1L)
    // the streaming tail serves logical names from the physical files
    val q = spark.readStream.format("delta").load(path).writeStream
      .format("memory").queryName("delta_colmap_tail")
      .option("checkpointLocation", freshDir("delta_colmap_cp")).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("delta_colmap_tail").as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq == Seq((1L, "a", 10L), (2L, "b", 20L)))
    // APPENDS stage under physical names (the mapped-writer path)
    DeltaLake.write(Seq((9L, "z", 30L)).toDF("k", "v", "p"), path, mode = SaveMode.Append)
    assert(DeltaLake.read(spark, path).as[(Long, String, Long)].collect().sortBy(_._1)
      .toSeq == Seq((1L, "a", 10L), (2L, "b", 20L), (9L, "z", 30L)))
    // the appended file landed in a PHYSICAL partition dir, its columns physical
    val appended = java.nio.file.Files.list(Paths.get(path, "col-ccc=30")).toArray
      .map(_.toString).filter(_.endsWith(".parquet"))
    assert(appended.nonEmpty, "append must stage under the physical partition dir")
    assert(spark.read.parquet(appended.head).columns.toSet == Set("col-aaa", "col-bbb"))
    // copy-on-write DELETE rewrites under physical names too
    DeltaLake.deleteWhere(spark, path, col("k") === 9L)
    assert(DeltaLake.read(spark, path).as[(Long, String, Long)].collect().sortBy(_._1)
      .toSeq == Seq((1L, "a", 10L), (2L, "b", 20L)))
  }

  test("columnMapping=name creation: full write/DML/CDF lifecycle under minted physical names") {
    import spark.implicits._
    val path = freshDir("delta_cm_create")
    DeltaLake.write(Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "v", "p"), path,
      partitionBy = Seq("p"), columnMapping = Some("name"))
    val s0 = DeltaLake.snapshot(spark, path)
    assert(s0.mapMode.contains("name"))
    assert(s0.protocol.minReader == 2 && s0.protocol.minWriter == 5)
    // physical names are minted col-<uuid>, never the logical names
    assert(s0.columnMapping.values.forall(_.startsWith("col-")))
    assert(s0.configuration("delta.columnMapping.maxColumnId") == "3")
    // the data files and partition dirs speak physical
    val physP = s0.physicalName("p")
    assert(java.nio.file.Files.exists(Paths.get(path, s"$physP=10")))
    assert(DeltaLake.read(spark, path).as[(Long, String, Long)].collect().sortBy(_._1)
      .toSeq == Seq((1L, "a", 10L), (2L, "b", 20L)))
    // stats skip on the physical keys: an equality probe prunes files
    assert(DeltaLake.read(spark, path).filter(col("p") === 10L).count() == 1L)
    // append, update, upsert, MoR delete, compact — all mapped-aware
    DeltaLake.write(Seq((3L, "c", 10L)).toDF("k", "v", "p"), path, mode = SaveMode.Append)
    DeltaLake.updateWhere(spark, path, Map("v" -> lit("C")), Some(col("k") === 3L))
    DeltaLake.upsertByKey(spark, path,
      Seq((2L, "B", 20L), (4L, "d", 20L)).toDF("k", "v", "p"), "k")
    DeltaLake.deleteMergeOnRead(spark, path, col("k") === 1L)
    assert(DeltaLake.read(spark, path).as[(Long, String, Long)].collect().sortBy(_._1)
      .toSeq == Seq((2L, "B", 20L), (3L, "C", 10L), (4L, "d", 20L)))
    DeltaLake.compact(spark, path, targetBytes = 1L << 20)
    assert(DeltaLake.read(spark, path).count() == 3L)
    // mergeSchema evolution MINTS a mapping for the new column
    DeltaLake.write(Seq((5L, "e", 10L, 99L)).toDF("k", "v", "p", "extra"), path,
      mode = SaveMode.Append, mergeSchema = true)
    val s1 = DeltaLake.snapshot(spark, path)
    assert(s1.columnMapping.keySet == Set("k", "v", "p", "extra"))
    assert(s1.configuration("delta.columnMapping.maxColumnId") == "4")
    assert(s1.columnMapping("k") == s0.columnMapping("k"), "retained ids must not re-mint")
    assert(DeltaLake.read(spark, path).filter(col("extra").isNotNull).count() == 1L)
    // CDF on the mapped table: enable, mutate, read the feed logically
    DeltaLake.enableChangeDataFeed(spark, path)
    val vDel = DeltaLake.deleteWhere(spark, path, col("k") === 4L)
    val feed = DeltaLake.changeFeed(spark, path, vDel)
    assert(feed.filter(col("_change_type") === "delete").select("k")
      .as[Long].collect().toSeq == Seq(4L))
  }

  test("columnMapping=id: parquet field ids resolve columns, surviving physical renames") {
    import spark.implicits._
    val path = freshDir("delta_cm_id")
    DeltaLake.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path,
      columnMapping = Some("id"))
    assert(DeltaLake.snapshot(spark, path).isIdMode)
    assert(DeltaLake.read(spark, path).as[(Long, String)].collect().sortBy(_._1)
      .toSeq == Seq((1L, "a"), (2L, "b")))
    // FORGE a foreign writer renaming every physical name in the log
    // while keeping the field ids — id-mode readers must not care,
    // because resolution is by the parquet footer's field ids
    val snap = DeltaLake.snapshot(spark, path)
    import org.apache.spark.sql.types.StructType
    val renamed = StructType(snap.rawSchema.fields.map { f =>
      val md = new org.apache.spark.sql.types.MetadataBuilder().withMetadata(f.metadata)
        .putString("delta.columnMapping.physicalName",
          "renamed-" + f.metadata.getLong("delta.columnMapping.id")).build()
      f.copy(metadata = md)
    })
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = om.createObjectNode()
    val md = meta.putObject("metaData")
    md.put("id", "t"); md.put("schemaString", renamed.json)
    md.putObject("format").put("provider", "parquet")
    md.putArray("partitionColumns")
    val conf = md.putObject("configuration")
    snap.configuration.foreach { case (k, v) => conf.put(k, v) }
    java.nio.file.Files.write(Paths.get(path, "_delta_log", f"${1L}%020d.json"),
      (om.writeValueAsString(meta) + "\n").getBytes("UTF-8"))
    // values still resolve: name matching would find NO column called
    // renamed-1/renamed-2 in the files and serve nulls or fail
    assert(DeltaLake.read(spark, path).as[(Long, String)].collect().sortBy(_._1)
      .toSeq == Seq((1L, "a"), (2L, "b")))
    // appends after the rename stage files under the NEW physical
    // names with the SAME ids — both generations resolve by id
    DeltaLake.write(Seq((3L, "c")).toDF("k", "v"), path, mode = SaveMode.Append)
    assert(DeltaLake.read(spark, path).as[(Long, String)].collect().sortBy(_._1)
      .toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // read-then-append round-trips: the scan's field-id plumbing must
    // not leak into the frame and fail the schema-equality require
    DeltaLake.write(DeltaLake.read(spark, path).filter(col("k") === 3L), path,
      mode = SaveMode.Append)
    assert(DeltaLake.read(spark, path).count() == 4L)
  }

  test("addColumn: one metaData commit; old files read NULL; mapped tables mint a fresh id") {
    import spark.implicits._
    val path = freshDir("delta_addcol")
    DeltaLake.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    DeltaLake.addColumn(spark, path, "score", org.apache.spark.sql.types.DoubleType)
    val cur = DeltaLake.read(spark, path)
    assert(cur.columns.toSeq == Seq("k", "v", "score"))
    assert(cur.filter(col("score").isNull).count() == 2L)
    DeltaLake.write(Seq((3L, "c", 0.5)).toDF("k", "v", "score"), path,
      mode = SaveMode.Append)
    val got = DeltaLake.read(spark, path).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got == Map(1L -> None, 2L -> None, 3L -> Some(0.5)))
    // mapped table: the added field gets a fresh id + physical name and
    // maxColumnId advances
    val mp = freshDir("delta_addcol_mapped")
    DeltaLake.write(Seq((1L, "x")).toDF("k", "v"), mp)
    DeltaLake.upgradeColumnMapping(spark, mp)
    val maxBefore = DeltaLake.snapshot(spark, mp)
      .configuration("delta.columnMapping.maxColumnId").toLong
    DeltaLake.addColumn(spark, mp, "w", org.apache.spark.sql.types.LongType)
    val snapM = DeltaLake.snapshot(spark, mp)
    assert(snapM.configuration("delta.columnMapping.maxColumnId").toLong == maxBefore + 1)
    val wf = snapM.rawSchema.fields.find(_.name == "w").get
    assert(wf.metadata.contains("delta.columnMapping.physicalName") &&
      wf.metadata.getLong("delta.columnMapping.id") == maxBefore + 1)
    assert(DeltaLake.read(spark, mp).columns.toSeq == Seq("k", "v", "w"))
    intercept[IllegalArgumentException](
      DeltaLake.addColumn(spark, path, "K", org.apache.spark.sql.types.LongType))
  }

  test("upgradeColumnMapping + renameColumn: a rename is one metadata line, zero data files") {
    import spark.implicits._
    val path = freshDir("delta_cm_upgrade")
    DeltaLake.write((0L until 40L).map(k => (k, k % 4)).toDF("k", "grp"), path)
    // renames without mapping refuse (they would rewrite every file)
    val e = intercept[IllegalArgumentException](
      DeltaLake.renameColumn(spark, path, "grp", "bucket"))
    assert(e.getMessage.contains("not column-mapped"))
    val before = listDataFiles(path)
    DeltaLake.upgradeColumnMapping(spark, path)
    val up = DeltaLake.snapshot(spark, path)
    // upgrade keeps each field's own name as physicalName — the
    // existing files already speak it
    assert(up.mapMode.contains("name") && up.physicalName("grp") == "grp")
    assert(DeltaLake.upgradeColumnMapping(spark, path) == up.version, "idempotent")
    DeltaLake.renameColumn(spark, path, "grp", "bucket")
    assert(listDataFiles(path) == before, "rename must write zero data files")
    val got = DeltaLake.read(spark, path)
    assert(got.schema.fieldNames.toSeq == Seq("k", "bucket"))
    assert(got.filter(col("bucket") === 2L).count() == 10L)
    // appends under the NEW logical name land in the OLD physical layout
    DeltaLake.write(Seq((100L, 9L)).toDF("k", "bucket"), path, mode = SaveMode.Append)
    assert(DeltaLake.read(spark, path).filter(col("bucket") === 9L).count() == 1L)
    // RESTORE across the rename reverts the schema, still metadata-only
    val files2 = listDataFiles(path)
    DeltaLake.restore(spark, path, 1L) // v1 = the upgrade commit (pre-rename)
    assert(listDataFiles(path) == files2)
    assert(DeltaLake.read(spark, path).schema.fieldNames.toSeq == Seq("k", "grp"))
    assert(DeltaLake.read(spark, path).count() == 40L)
  }

  test("mapped CDF table: schema-changing overwrite records readable change images") {
    import spark.implicits._
    val path = freshDir("delta_cm_cdf_ow")
    DeltaLake.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path,
      columnMapping = Some("name"))
    DeltaLake.enableChangeDataFeed(spark, path)
    val vApp = DeltaLake.write(Seq((3L, "c")).toDF("k", "v"), path,
      mode = SaveMode.Append)
    // a cdc file staged under the PRE-change mapping…
    val vDel = DeltaLake.deleteWhere(spark, path, col("k") === 1L)
    // …then a logical rename (physical names unchanged)…
    DeltaLake.renameColumn(spark, path, "v", "label")
    val preOw = DeltaLake.snapshot(spark, path)
    // …then the previously-refused shape: a schema-CHANGING overwrite
    // on a mapped + CDF table (keeps k+label, adds score)
    val vOw = DeltaLake.write(
      Seq((10L, "x", 1.5), (11L, "y", 2.5)).toDF("k", "label", "score"), path)
    val snap = DeltaLake.snapshot(spark, path)
    // retained columns KEEP their physical names; score is freshly minted
    assert(snap.columnMapping("k") == preOw.columnMapping("k"))
    assert(snap.columnMapping("label") == preOw.columnMapping("label"))
    assert(snap.columnMapping.keySet == Set("k", "label", "score"))
    val feed = DeltaLake.changeFeed(spark, path, vApp)
    // the append's derived insert resolves through the rename: its data
    // file speaks the old physical names, which the rename never touched
    assert(feed.filter(col("_commit_version") === vApp)
      .select("k", "label").as[(Long, String)].collect().toSeq == Seq((3L, "c")))
    // the pre-change cdc file reads under the LATEST mapping: retained
    // physical names resolve, the new column serves null
    val delRow = feed.filter(col("_commit_version") === vDel).collect()
    assert(delRow.map(_.getAs[Long]("k")).toSeq == Seq(1L))
    assert(delRow.forall(_.isNullAt(delRow.head.fieldIndex("score"))))
    // the overwrite records delete images of every surviving prior row
    // (score null) plus inserts of the new shape
    val owDel = feed.filter(col("_commit_version") === vOw &&
      col("_change_type") === "delete")
    assert(owDel.select("k").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    assert(owDel.filter(col("score").isNotNull).count() == 0L)
    assert(feed.filter(col("_commit_version") === vOw && col("_change_type") === "insert")
      .select("k", "label", "score").as[(Long, String, Double)].collect()
      .sortBy(_._1).toSeq == Seq((10L, "x", 1.5), (11L, "y", 2.5)))
    assert(DeltaLake.read(spark, path).columns.toSeq == Seq("k", "label", "score"))
  }

  test("nested struct columns map recursively in both directions") {
    import spark.implicits._
    val path = freshDir("delta_cm_nested")
    import org.apache.spark.sql.types.StructType
    val df = Seq((1L, ("x", 10L)), (2L, ("y", 20L))).toDF("k", "s")
    DeltaLake.write(df, path, columnMapping = Some("name"))
    val snap = DeltaLake.snapshot(spark, path)
    // nested fields carry their own minted physical names
    val rawS = snap.rawSchema("s").dataType.asInstanceOf[StructType]
    assert(rawS.fields.forall(_.metadata.contains("delta.columnMapping.physicalName")))
    // the staged file's nested columns are physical
    val file = listDataFiles(path).head
    val fileS = spark.read.parquet(file).schema
    assert(fileS.fieldNames.forall(_.startsWith("col-")))
    val innerNames = fileS.fields.collectFirst {
      case f if f.dataType.isInstanceOf[StructType] =>
        f.dataType.asInstanceOf[StructType].fieldNames.toSeq
    }.get
    assert(innerNames.forall(_.startsWith("col-")), s"inner fields physical: $innerNames")
    // and the read renames all levels back to logical
    val got = DeltaLake.read(spark, path)
    assert(got.schema.fieldNames.toSeq == Seq("k", "s"))
    assert(got.select(col("k"), col("s._1"), col("s._2")).as[(Long, String, Long)]
      .collect().sortBy(_._1).toSeq == Seq((1L, "x", 10L), (2L, "y", 20L)))
    // rewrite DML round-trips the nested mapping
    DeltaLake.deleteWhere(spark, path, col("s._2") === 10L)
    assert(DeltaLake.read(spark, path).select(col("s._1")).as[String].collect()
      .toSeq == Seq("y"))
  }

  test("CHECK constraints + NOT NULL enforce on every write path") {
    import spark.implicits._
    val path = freshDir("delta_constraints")
    // Option-typed amount: the table column is NULLABLE (a toDF of raw
    // Longs would mint NOT NULL columns and make the null-append test
    // below exercise the wrong constraint)
    DeltaLake.write(Seq((1L, Some(10L)), (2L, Some(20L))).toDF("k", "amount"), path)
    // adding a constraint the data violates refuses
    val e0 = intercept[IllegalArgumentException](
      DeltaLake.addCheckConstraint(spark, path, "big", "amount > 15"))
    assert(e0.getMessage.contains("violates"))
    val v = DeltaLake.addCheckConstraint(spark, path, "positive", "amount > 0")
    assert(DeltaLake.snapshot(spark, path).protocol.minWriter >= 3)
    assert(DeltaLake.addCheckConstraint(spark, path, "positive2", "amount > 0") == v + 1)
    DeltaLake.dropCheckConstraint(spark, path, "positive2")
    // appends that violate refuse, before anything is committed
    val e1 = intercept[IllegalArgumentException](
      DeltaLake.write(Seq((3L, Some(-5L))).toDF("k", "amount"), path,
        mode = SaveMode.Append))
    assert(e1.getMessage.contains("positive"))
    assert(DeltaLake.read(spark, path).count() == 2L, "failed write must not land")
    // null passes a CHECK (SQL semantics)
    DeltaLake.write(Seq((3L, Option.empty[Long])).toDF("k", "amount"), path,
      mode = SaveMode.Append)
    // UPDATE that would break the constraint refuses
    val e2 = intercept[IllegalArgumentException](
      DeltaLake.updateWhere(spark, path, Map("amount" -> lit(-1L)), Some(col("k") === 1L)))
    assert(e2.getMessage.contains("positive"))
    // MERGE enforcement
    val e3 = intercept[IllegalArgumentException](
      DeltaLake.upsertByKey(spark, path, Seq((2L, Some(-9L))).toDF("k", "amount"), "k"))
    assert(e3.getMessage.contains("positive"))
    DeltaLake.upsertByKey(spark, path, Seq((2L, Some(99L))).toDF("k", "amount"), "k")
    assert(DeltaLake.read(spark, path).filter(col("amount") === 99L).count() == 1L)
    // a foreign table with constraints is enforced by this writer too
    // (the log property IS the contract); NOT NULL fields likewise
    val p2 = freshDir("delta_notnull")
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L, "a")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType,
          nullable = false),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))
    DeltaLake.write(df, p2)
    val e4 = intercept[IllegalArgumentException](
      DeltaLake.write(spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(null, "x")), df.schema.copy(fields =
          df.schema.fields.map(_.copy(nullable = true)))), p2, mode = SaveMode.Append))
    assert(e4.getMessage.contains("NOT NULL"))
  }

  test("generated columns: computed when omitted, validated when present") {
    import spark.implicits._
    val path = freshDir("delta_gen")
    DeltaLake.write(Seq((1L, "ab"), (2L, "xyz")).toDF("k", "v"), path)
    DeltaLake.addGeneratedColumn(spark, path, "v_len",
      org.apache.spark.sql.types.IntegerType, "length(v)")
    assert(DeltaLake.snapshot(spark, path).protocol.minWriter >= 4)
    // pre-addition files read NULL for the generated column
    assert(DeltaLake.read(spark, path).filter(col("v_len").isNull).count() == 2L)
    // an append WITHOUT the column computes it
    DeltaLake.write(Seq((3L, "hello")).toDF("k", "v"), path, mode = SaveMode.Append)
    assert(DeltaLake.read(spark, path).filter(col("k") === 3L)
      .select("v_len").as[Int].head() == 5)
    // an append WITH a wrong value refuses
    val e = intercept[IllegalArgumentException](
      DeltaLake.write(Seq((4L, "no", 99)).toDF("k", "v", "v_len"), path,
        mode = SaveMode.Append))
    assert(e.getMessage.contains("GENERATED"))
    // with the right value it lands
    DeltaLake.write(Seq((4L, "no", 2)).toDF("k", "v", "v_len"), path,
      mode = SaveMode.Append)
    assert(DeltaLake.read(spark, path).count() == 4L)
    // UPDATE breaking the generation invariant refuses
    val e2 = intercept[IllegalArgumentException](
      DeltaLake.updateWhere(spark, path, Map("v" -> lit("longer")), Some(col("k") === 4L)))
    assert(e2.getMessage.contains("GENERATED"))
    // the expression survives an overwrite's metaData re-emission
    DeltaLake.write(Seq((9L, "zzz")).toDF("k", "v"), path, mode = SaveMode.Append)
    assert(DeltaLake.snapshot(spark, path).rawSchema("v_len")
      .metadata.contains("delta.generationExpression"))
  }

  test("writer gating: appendOnly tables refuse mutations; unknown writer features refuse writes") {
    import spark.implicits._
    val path = freshDir("delta_appendonly")
    DeltaLake.write(Seq((1L, "a")).toDF("k", "v"), path)
    // set delta.appendOnly via the property path enableChangeDataFeed uses
    val snap = DeltaLake.snapshot(spark, path)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = om.createObjectNode()
    val md = meta.putObject("metaData")
    md.put("id", "t"); md.put("schemaString", snap.rawSchema.json)
    md.putObject("format").put("provider", "parquet")
    md.putArray("partitionColumns")
    md.putObject("configuration").put("delta.appendOnly", "true")
    java.nio.file.Files.write(Paths.get(path, "_delta_log", f"${1L}%020d.json"),
      (om.writeValueAsString(meta) + "\n").getBytes("UTF-8"))
    // appends still land
    DeltaLake.write(Seq((2L, "b")).toDF("k", "v"), path, mode = SaveMode.Append)
    // every mutating path refuses
    for (op <- Seq(
      () => DeltaLake.deleteWhere(spark, path, col("k") === 1L),
      () => DeltaLake.deleteMergeOnRead(spark, path, col("k") === 1L),
      () => DeltaLake.updateWhere(spark, path, Map("v" -> lit("x")), None),
      () => DeltaLake.upsertByKey(spark, path, Seq((1L, "z")).toDF("k", "v"), "k"),
      () => DeltaLake.write(Seq((9L, "z")).toDF("k", "v"), path),
      () => DeltaLake.restore(spark, path, 0L))) {
      val e = intercept[IllegalArgumentException](op())
      assert(e.getMessage.contains("appendOnly"), e.getMessage)
    }
    // compaction (dataChange=false) is still legal on append-only tables
    DeltaLake.compact(spark, path, targetBytes = 1L << 20)
    assert(DeltaLake.read(spark, path).count() == 2L)
    // unknown writer features: reads work, writes refuse loudly
    val p2 = freshDir("delta_wfeat")
    DeltaLake.write(Seq((1L, "a")).toDF("k", "v"), p2)
    java.nio.file.Files.write(Paths.get(p2, "_delta_log", f"${1L}%020d.json"),
      ("""{"protocol":{"minReaderVersion":1,"minWriterVersion":7,""" +
        """"readerFeatures":[],"writerFeatures":["icebergCompatV2"]}}""" + "\n")
        .getBytes("UTF-8"))
    assert(DeltaLake.read(spark, p2).count() == 1L)
    val e2 = intercept[IllegalArgumentException](
      DeltaLake.write(Seq((2L, "b")).toDF("k", "v"), p2, mode = SaveMode.Append))
    assert(e2.getMessage.contains("icebergCompatV2"))
  }

  test("multi-part and V2 checkpoints read after the JSON tail is vacuumed") {
    import spark.implicits._
    import org.apache.spark.sql.functions.struct
    // ---- multi-part: split a classic checkpoint into 2 spec-named parts
    val path = freshDir("delta_cp_multi")
    DeltaLake.write((0L until 40L).map(k => (k, k % 4)).toDF("k", "grp"),
      path, partitionBy = Seq("grp"))
    DeltaLake.write(Seq((100L, 9L)).toDF("k", "grp"), path, mode = SaveMode.Append)
    DeltaLake.checkpoint(spark, path)
    val log = Paths.get(path, "_delta_log")
    val classic = log.resolve(f"${1L}%020d.checkpoint.parquet")
    val cpDf = spark.read.parquet(classic.toString)
    def writeOnePart(df: org.apache.spark.sql.DataFrame, dest: java.nio.file.Path): Unit = {
      val tmp = freshDir("cp_forge_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = java.nio.file.Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      java.nio.file.Files.copy(Paths.get(part), dest)
    }
    writeOnePart(cpDf.filter(col("add").isNull),
      log.resolve(f"${1L}%020d.checkpoint.0000000001.0000000002.parquet"))
    writeOnePart(cpDf.filter(col("add").isNotNull),
      log.resolve(f"${1L}%020d.checkpoint.0000000002.0000000002.parquet"))
    java.nio.file.Files.delete(classic)
    java.nio.file.Files.deleteIfExists(log.resolve(f"${1L}%020d.checkpoint.parquet.crc"))
    for (v <- 0L to 1L) {
      java.nio.file.Files.delete(log.resolve(f"$v%020d.json"))
      java.nio.file.Files.deleteIfExists(log.resolve(f".$v%020d.json.crc"))
    }
    assert(DeltaLake.read(spark, path).count() == 41L)
    assert(DeltaLake.read(spark, path).filter(col("grp") === 2L).count() == 10L,
      "partition pruning must survive the multi-part replay")
    // an INCOMPLETE multi-part set (crashed foreign writer) is SKIPPED,
    // not fatal: here the JSON below it is vacuumed, so the skip
    // surfaces as the log-gap error — never half a table
    java.nio.file.Files.move(
      log.resolve(f"${1L}%020d.checkpoint.0000000002.0000000002.parquet"),
      log.resolve("hidden.tmp"))
    val eMulti = intercept[IllegalArgumentException](DeltaLake.snapshot(spark, path))
    assert(eMulti.getMessage.contains("gap"))
    java.nio.file.Files.move(log.resolve("hidden.tmp"),
      log.resolve(f"${1L}%020d.checkpoint.0000000002.0000000002.parquet"))
    // ...and when the JSON log IS intact, an incomplete set at a NEWER
    // version falls back to the older complete checkpoint + JSON
    DeltaLake.write(Seq((101L, 9L)).toDF("k", "grp"), path, mode = SaveMode.Append)
    // content is irrelevant — the incomplete set must never be read
    java.nio.file.Files.copy(
      log.resolve(f"${1L}%020d.checkpoint.0000000001.0000000002.parquet"),
      log.resolve(f"${2L}%020d.checkpoint.0000000001.0000000099.parquet"))
    assert(DeltaLake.read(spark, path).count() == 42L,
      "a crashed partial checkpoint must not brick a reconstructible table")
    // a stray OUT-OF-RANGE part (3 of 2) must not make a missing-part
    // set look complete: indices must be exactly 1..total
    java.nio.file.Files.copy(
      log.resolve(f"${1L}%020d.checkpoint.0000000001.0000000002.parquet"),
      log.resolve(f"${2L}%020d.checkpoint.0000000003.0000000099.parquet"))
    assert(DeltaLake.read(spark, path).count() == 42L,
      "part indices outside 1..total must not count toward completeness")

    // ---- V2: uuid-named JSON top file + add batches in _sidecars
    val p2 = freshDir("delta_cp_v2")
    DeltaLake.write((0L until 30L).map(k => (k, k % 3)).toDF("k", "grp"), p2)
    DeltaLake.write(Seq((200L, 7L)).toDF("k", "grp"), p2, mode = SaveMode.Append)
    DeltaLake.checkpoint(spark, p2)
    val log2 = Paths.get(p2, "_delta_log")
    val classic2 = log2.resolve(f"${1L}%020d.checkpoint.parquet")
    val cpDf2 = spark.read.parquet(classic2.toString)
    // sidecar parquet: ALL add actions
    java.nio.file.Files.createDirectories(log2.resolve("_sidecars"))
    writeOnePart(cpDf2.filter(col("add").isNotNull).select("add"),
      log2.resolve("_sidecars").resolve("batch-1.parquet"))
    // v2 JSON top: protocol + metaData (from the snapshot) + the sidecar ref
    val snap2 = DeltaLake.snapshot(spark, p2)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val protoLine =
      s"""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
        s""""readerFeatures":["v2Checkpoint"],"writerFeatures":["v2Checkpoint"]}}"""
    val metaNode = om.createObjectNode()
    val md = metaNode.putObject("metaData")
    md.put("id", "v2t"); md.put("schemaString", snap2.rawSchema.json)
    md.putObject("format").put("provider", "parquet")
    md.putArray("partitionColumns")
    md.putObject("configuration")
    val sidecarLine = """{"sidecar":{"path":"batch-1.parquet","sizeInBytes":1}}"""
    val cpMeta = """{"checkpointMetadata":{"version":1}}"""
    java.nio.file.Files.write(
      log2.resolve(f"${1L}%020d.checkpoint.80a083e8-7026.json"),
      (Seq(protoLine, om.writeValueAsString(metaNode), sidecarLine, cpMeta)
        .mkString("\n") + "\n").getBytes("UTF-8"))
    java.nio.file.Files.delete(classic2)
    java.nio.file.Files.deleteIfExists(log2.resolve(f".${1L}%020d.checkpoint.parquet.crc"))
    for (v <- 0L to 1L) {
      java.nio.file.Files.delete(log2.resolve(f"$v%020d.json"))
      java.nio.file.Files.deleteIfExists(log2.resolve(f".$v%020d.json.crc"))
    }
    assert(DeltaLake.read(spark, p2).count() == 31L)
    // the v2Checkpoint reader feature passes the protocol gate
    assert(DeltaLake.snapshot(spark, p2).protocol.readerFeatures.contains("v2Checkpoint"))
    // appends on top of the v2 checkpoint replay on top of it
    DeltaLake.write(Seq((300L, 8L)).toDF("k", "grp"), p2, mode = SaveMode.Append)
    assert(DeltaLake.read(spark, p2).count() == 32L)
    // checkpointing a v2-feature table writes the V2 SHAPE (uuid name +
    // checkpointMetadata), which this reader then resolves
    DeltaLake.checkpoint(spark, p2)
    val v2names = java.nio.file.Files.list(log2).toArray.map(_.toString)
      .filter(n => n.contains(f"${2L}%020d.checkpoint."))
    assert(v2names.nonEmpty && v2names.forall(!_.endsWith("checkpoint.parquet")),
      s"v2 tables must get uuid-named checkpoints, got ${v2names.toSeq}")
    assert(DeltaLake.read(spark, p2).count() == 32L)

    // ---- V2 with a PARQUET top file carrying the sidecar column
    val p3 = freshDir("delta_cp_v2pq")
    DeltaLake.write((0L until 20L).map(k => (k, k % 2)).toDF("k", "grp"), p3)
    DeltaLake.write(Seq((500L, 5L)).toDF("k", "grp"), p3, mode = SaveMode.Append)
    DeltaLake.checkpoint(spark, p3)
    val log3 = Paths.get(p3, "_delta_log")
    val classic3 = log3.resolve(f"${1L}%020d.checkpoint.parquet")
    val cpDf3 = spark.read.parquet(classic3.toString)
    java.nio.file.Files.createDirectories(log3.resolve("_sidecars"))
    writeOnePart(cpDf3.filter(col("add").isNotNull).select("add"),
      log3.resolve("_sidecars").resolve("batch-a.parquet"))
    val metaRows = cpDf3.filter(col("add").isNull)
      .withColumn("sidecar",
        lit(null).cast("struct<path:string,sizeInBytes:bigint>"))
    val scRow = metaRows.limit(1).select(
      metaRows.columns.filterNot(_ == "sidecar").toIndexedSeq.map(c =>
        lit(null).cast(metaRows.schema(c).dataType).as(c)) :+
        struct(lit("batch-a.parquet").as("path"), lit(1L).as("sizeInBytes"))
          .as("sidecar"): _*)
    writeOnePart(metaRows.unionByName(scRow),
      log3.resolve(f"${1L}%020d.checkpoint.11112222-3344.parquet"))
    java.nio.file.Files.delete(classic3)
    for (v <- 0L to 1L) {
      java.nio.file.Files.delete(log3.resolve(f"$v%020d.json"))
      java.nio.file.Files.deleteIfExists(log3.resolve(f".$v%020d.json.crc"))
    }
    assert(DeltaLake.read(spark, p3).count() == 21L)

    // ---- orphan PROTECTION must see sidecar-only adds: once the JSON
    // tail is vacuumed, the V2 sidecars are the only record of the live
    // files — a co-located Iceberg layer's removeOrphanFiles consults
    // allLoggedPaths and would otherwise reclaim referenced Delta data
    val liveV2 = DeltaLake.snapshot(spark, p2).files.map(_.path).toSet
    val loggedV2 = DeltaLake.allLoggedPaths(spark, p2)
    assert(liveV2.nonEmpty && liveV2.subsetOf(loggedV2),
      s"sidecar adds missing from allLoggedPaths: ${liveV2 -- loggedV2}")
    val liveV2pq = DeltaLake.snapshot(spark, p3).files.map(_.path).toSet
    val loggedV2pq = DeltaLake.allLoggedPaths(spark, p3)
    assert(liveV2pq.nonEmpty && liveV2pq.subsetOf(loggedV2pq),
      s"parquet-top sidecar adds missing: ${liveV2pq -- loggedV2pq}")
  }

  test("streaming sink: txn actions make batch replays exactly-once") {
    import spark.implicits._
    val src = freshDir("delta_sink_src")
    val tbl = freshDir("delta_sink_tbl")
    val cp = freshDir("delta_sink_cp")
    java.nio.file.Files.createDirectories(Paths.get(src))
    def feed(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite")
        .parquet(s"$src/$name")
    feed("b1", Seq((1L, "a"), (2L, "b")))
    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("k LONG, v STRING").option("maxFilesPerTrigger", "1")
        .parquet(s"$src/*")
        .writeStream.format("delta").option("checkpointLocation", cp)
        .start(tbl)
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    assert(DeltaLake.read(spark, tbl).count() == 2L)
    // the commit carries the txn watermark
    val snap = DeltaLake.snapshot(spark, tbl)
    assert(snap.txns.size == 1 && snap.txns.values.head >= 0L)
    // a RESTART with the same checkpoint delivers nothing new and —
    // crucially — replays nothing into the table
    runOnce()
    assert(DeltaLake.read(spark, tbl).count() == 2L, "restart must not double-append")
    // new data flows through; a replay AFTER a crash between table
    // commit and checkpoint advance is skipped by the txn watermark:
    // simulate by re-delivering batch 1 manually through the sink
    feed("b2", Seq((3L, "c")))
    runOnce()
    assert(DeltaLake.read(spark, tbl).count() == 3L)
    val appId = DeltaLake.snapshot(spark, tbl).txns.keys.head
    val sink = new org.apache.spark.sql.graft.DeltaSink(tbl, appId, Nil)
    val replayedBatch = DeltaLake.snapshot(spark, tbl).txns(appId)
    sink.addBatch(replayedBatch, Seq((99L, "dup")).toDF("k", "v"))
    assert(DeltaLake.read(spark, tbl).count() == 3L,
      "a batch at the txn watermark is a replay and must be skipped")
    sink.addBatch(replayedBatch + 1, Seq((4L, "d")).toDF("k", "v"))
    assert(DeltaLake.read(spark, tbl).count() == 4L)
    // the watermark survives a checkpoint fold + json vacuum
    DeltaLake.checkpoint(spark, tbl)
    val v = DeltaLake.versions(tbl).max
    for (old <- 0L until v)
      java.nio.file.Files.deleteIfExists(Paths.get(tbl, "_delta_log", f"$old%020d.json"))
    assert(DeltaLake.snapshot(spark, tbl).txns(appId) == replayedBatch + 1,
      "txn watermarks must fold into checkpoints")
  }

  test("legacy delta.invariants field metadata enforces on write") {
    import spark.implicits._
    import org.apache.spark.sql.types.{MetadataBuilder, StructType}
    val path = freshDir("delta_invariants")
    DeltaLake.write(Seq((1L, Some(10L))).toDF("k", "amount"), path)
    // forge the invariant a legacy (writer v2) foreign table carries
    val snap = DeltaLake.snapshot(spark, path)
    val withInv = StructType(snap.rawSchema.fields.map {
      case f if f.name == "amount" => f.copy(metadata = new MetadataBuilder()
        .putString("delta.invariants",
          """{"expression":{"expression":"amount < 100"}}""").build())
      case f => f
    })
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = om.createObjectNode()
    val md = meta.putObject("metaData")
    md.put("id", "inv"); md.put("schemaString", withInv.json)
    md.putObject("format").put("provider", "parquet")
    md.putArray("partitionColumns"); md.putObject("configuration")
    java.nio.file.Files.write(Paths.get(path, "_delta_log", f"${1L}%020d.json"),
      (om.writeValueAsString(meta) + "\n").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](
      DeltaLake.write(Seq((2L, Some(500L))).toDF("k", "amount"), path,
        mode = SaveMode.Append))
    assert(e.getMessage.contains("INVARIANT"))
    DeltaLake.write(Seq((2L, Some(50L))).toDF("k", "amount"), path, mode = SaveMode.Append)
    assert(DeltaLake.read(spark, path).count() == 2L)
    // unlike CHECK, a NULL invariant result is a VIOLATION (the
    // reference writer's legacy semantics)
    val eNull = intercept[IllegalArgumentException](
      DeltaLake.write(Seq((3L, Option.empty[Long])).toDF("k", "amount"), path,
        mode = SaveMode.Append))
    assert(eNull.getMessage.contains("INVARIANT"))
  }

  test("restore refuses when the target's deletion vectors were vacuumed") {
    import spark.implicits._
    val path = freshDir("delta_restore_dv")
    // deletes large enough to force PATH-stored vectors (small ones
    // inline into the log and can never dangle)
    DeltaLake.write(spark.range(0, 12000).selectExpr("id AS k", "id % 3 AS v"), path) // v0
    DeltaLake.deleteMergeOnRead(spark, path, col("k") % 2 === 0L)                     // v1: DV d1
    DeltaLake.deleteMergeOnRead(spark, path, col("k") % 3 === 0L)                     // v2: superseding d2
    // v1's bin is no longer referenced by the CURRENT snapshot — model
    // a vacuum reclaiming it
    val v1dv = DeltaLake.snapshot(spark, path, Some(1L)).files.flatMap(_.dv)
      .map(_.pathOrInlineDv).distinct
    v1dv.foreach(p => java.nio.file.Files.deleteIfExists(Paths.get(p)))
    val e = intercept[IllegalArgumentException](DeltaLake.restore(spark, path, 1L))
    assert(e.getMessage.contains("deletion vector"))
    // restoring to v0 (no DVs) still works
    DeltaLake.restore(spark, path, 0L)
    assert(DeltaLake.read(spark, path).count() == 12000L)
  }

  test("upsertByKey with a txn id is idempotent under batch replay") {
    import spark.implicits._
    val path = freshDir("delta_merge_txn")
    DeltaLake.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    val v1 = DeltaLake.upsertByKey(spark, path,
      Seq((2L, "B2"), (3L, "c")).toDF("k", "v"), "k", txn = Some("job" -> 7L))
    assert(DeltaLake.read(spark, path).count() == 3L)
    // the REPLAY of the same batch id (crash between commit and
    // checkpoint advance) is a no-op — not a double merge
    assert(DeltaLake.upsertByKey(spark, path,
      Seq((2L, "WRONG"), (9L, "dup")).toDF("k", "v"), "k", txn = Some("job" -> 7L)) == v1)
    assert(DeltaLake.read(spark, path).count() == 3L)
    assert(DeltaLake.read(spark, path).filter(col("v") === "B2").count() == 1L)
    // the next batch id lands
    DeltaLake.upsertByKey(spark, path, Seq((4L, "d")).toDF("k", "v"), "k",
      txn = Some("job" -> 8L))
    assert(DeltaLake.read(spark, path).count() == 4L)
    // independent app ids do not interfere
    DeltaLake.upsertByKey(spark, path, Seq((5L, "e")).toDF("k", "v"), "k",
      txn = Some("other" -> 0L))
    assert(DeltaLake.read(spark, path).count() == 5L)
  }

  test("the files inspection table lists the live snapshot's files") {
    import spark.implicits._
    val path = freshDir("delta_files_table")
    DeltaLake.write(Seq((1L, "x", 10L), (2L, "y", 20L)).toDF("k", "v", "p"), path,
      partitionBy = Seq("p"))
    val files = spark.read.format("delta").option("files", "true").load(path)
    assert(files.count() == 2L)
    assert(files.select("partition").as[String].collect().toSet == Set("p=10", "p=20"))
    DeltaLake.deleteMergeOnRead(spark, path, col("k") === 1L)
    val after = spark.read.format("delta").option("files", "true").load(path)
    assert(after.filter(col("dv_cardinality") > 0L).count() == 1L)
    // the partitions summary aggregates the same manifest walk
    val parts = spark.read.format("delta").option("partitions", "true").load(path)
      .orderBy("partition").collect()
    assert(parts.map(_.getString(0)).toSeq == Seq("p=10", "p=20"))
    assert(parts.map(_.getLong(2)).sum == 2L)
  }

  test("deletion vectors: MoR delete, superseding union, checkpoint fold, vacuum, stream gate") {
    import spark.implicits._
    val path = freshDir("delta_dv")
    DeltaLake.write(spark.range(0, 200).select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(4, col("k")), path)
    val before = DeltaLake.snapshot(spark, path)
    DeltaLake.deleteMergeOnRead(spark, path, col("k") % 10 === 0L)
    val after = DeltaLake.snapshot(spark, path)
    assert(after.files.map(_.path).toSet == before.files.map(_.path).toSet,
      "a DV delete must rewrite ZERO data files")
    assert(after.hasDeletionVectors &&
      after.files.flatMap(_.dv).map(_.cardinality).sum == 20L)
    // small vectors INLINE into the log (storageType "i", no .bin
    // litter for point deletes); only large ones go to a shared file
    assert(after.files.flatMap(_.dv).forall(d =>
      d.storageType == "i" || d.storageType == "p"))
    assert(after.files.flatMap(_.dv).exists(_.storageType == "i"),
      "a 5-position vector must inline, not mint a bin file")
    val got = DeltaLake.read(spark, path)
    assert(got.count() == 180L && got.filter(col("k") % 10 === 0L).count() == 0L)
    assert(!got.queryExecution.executedPlan.toString.toLowerCase.contains("join"),
      "deletion vectors must apply as a row-index filter, not a join")
    // the commit upgraded the table to the table-features protocol
    val logText = new String(java.nio.file.Files.readAllBytes(
      Paths.get(path, "_delta_log", f"${1L}%020d.json")), "UTF-8")
    assert(logText.contains("\"minReaderVersion\":3") && logText.contains("deletionVectors"))
    // a second delete SUPERSEDES the per-file vector (union, not append)
    DeltaLake.deleteMergeOnRead(spark, path, col("k") < 20L)
    val after2 = DeltaLake.snapshot(spark, path)
    assert(after2.files.flatMap(_.dv).map(_.cardinality).sum == 38L,
      "per-file vectors must be superseded by the union of old and new positions")
    assert(DeltaLake.read(spark, path).count() == 162L)
    assert(after2.files.count(_.dv.nonEmpty) >= 1)
    // no-match delete is not a commit
    val nV = DeltaLake.versions(path).size
    DeltaLake.deleteMergeOnRead(spark, path, col("k") === -1L)
    assert(DeltaLake.versions(path).size == nV)
    // an appended row reusing a deleted position is untouched (new file)
    DeltaLake.write(Seq((0L, 0L)).toDF("k", "v"), path, mode = SaveMode.Append)
    assert(DeltaLake.read(spark, path).filter(col("k") === 0L).count() == 1L)
    assert(DeltaLake.read(spark, path).count() == 163L)
    // time travel before the deletes still serves every row
    assert(DeltaLake.read(spark, path, versionAsOf = Some(0L)).count() == 200L)
    // SQL serves the DV snapshot through the fallback relation
    assert(spark.read.format("delta").load(path).count() == 163L)
    // checkpoint folding preserves descriptors AND the protocol
    DeltaLake.checkpoint(spark, path)
    assert(DeltaLake.snapshot(spark, path).hasDeletionVectors)
    assert(DeltaLake.read(spark, path).count() == 163L)
    // vacuum keeps every LIVE path-stored deletion-vector file
    // (inline "i" vectors travel in the log and have no file to keep)
    val liveBins = DeltaLake.snapshot(spark, path).files.flatMap(_.dv)
      .filter(_.storageType == "p").map(_.pathOrInlineDv).toSet
    DeltaLake.vacuum(spark, path)
    liveBins.foreach(p => assert(java.nio.file.Files.exists(Paths.get(p)),
      s"live DV $p must survive vacuum"))
    assert(DeltaLake.read(spark, path).count() == 163L)
    // a fresh streaming bootstrap over DV debt refuses
    val eS = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("delta").load(path).writeStream
        .format("memory").queryName("delta_dv_tail")
        .option("checkpointLocation", freshDir("delta_dv_cp")).start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(eS.getCause.getMessage.contains("deletion vectors"))
    // copy-on-write delete folds every file's debt (pure-remove commit),
    // after which the orphaned DV bins are vacuum-reclaimable
    DeltaLake.deleteWhere(spark, path, col("k") >= 0L)
    assert(DeltaLake.read(spark, path).count() == 0L)
    val reclaimed = DeltaLake.vacuum(spark, path)
    assert(reclaimed >= liveBins.size + 1,
      s"dead data files AND orphaned DV bins must be reclaimed (got $reclaimed)")
    liveBins.foreach(p => assert(!java.nio.file.Files.exists(Paths.get(p)),
      s"orphaned DV $p must be reclaimed"))
  }

  test("foreign deletion-vector shapes: inline z85 and uuid-named files") {
    import spark.implicits._
    val path = freshDir("delta_dv_foreign")
    DeltaLake.write(spark.range(0, 10).coalesce(1)
      .select(col("id").as("k"), (col("id") * 2).as("v")), path)
    val f = DeltaLake.snapshot(spark, path).files.head
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    // INLINE: positions {0,1} serialize to a multiple-of-4 byte blob
    val inline = DeltaDv.z85Encode(DeltaDv.serialize(Array(0L, 1L)))
    def commit(v: Long, dvNode: String): Unit = {
      val lines = Seq(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["deletionVectors"],"writerFeatures":["deletionVectors"]}}""",
        s"""{"remove":{"path":"${f.path}","deletionTimestamp":1,"dataChange":true}}""",
        s"""{"add":{"path":"${f.path}","partitionValues":{},"size":${f.size},""" +
          s""""modificationTime":1,"dataChange":true,"deletionVector":$dvNode}}""")
      java.nio.file.Files.write(Paths.get(path, "_delta_log", f"$v%020d.json"),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    }
    commit(1L, s"""{"storageType":"i","pathOrInlineDv":"$inline","sizeInBytes":${
      DeltaDv.serialize(Array(0L, 1L)).length},"cardinality":2}""")
    assert(DeltaLake.read(spark, path).count() == 8L)
    assert(DeltaLake.read(spark, path).filter(col("k") < 2L).count() == 0L)
    // UUID file: positions {5}, bin written under the uuid naming scheme
    val uuid = java.util.UUID.randomUUID()
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits); bb.putLong(uuid.getLeastSignificantBits)
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(conf)
    val blob = DeltaDv.serialize(Array(5L))
    val framing = DeltaDv.writeFile(fs,
      new org.apache.hadoop.fs.Path(path, s"deletion_vector_$uuid.bin"), Seq(blob))
    commit(2L, s"""{"storageType":"u","pathOrInlineDv":"${DeltaDv.z85Encode(bb.array())}",""" +
      s""""offset":${framing.head._1},"sizeInBytes":${framing.head._2},"cardinality":1}""")
    assert(DeltaLake.read(spark, path).count() == 9L)
    assert(DeltaLake.read(spark, path).filter(col("k") === 5L).count() == 0L)
    // an unknown reader feature still refuses loudly
    val lines3 = Seq("""{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      """"readerFeatures":["collations"],"writerFeatures":["collations"]}}""")
    java.nio.file.Files.write(Paths.get(path, "_delta_log", f"${3L}%020d.json"),
      (lines3.mkString("\n") + "\n").getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException](DeltaLake.read(spark, path).count())
    assert(e.getMessage.contains("collations"))
  }

  test("change data feed: cdc actions per mutation, derived inserts, loud pre-enablement gate") {
    import spark.implicits._
    val path = freshDir("delta_cdf")
    DeltaLake.write((0L until 40L).map(k => (k, k % 7)).toDF("k", "v")
      .repartitionByRange(2, col("k")), path) // v0: inserts (derived)
    DeltaLake.enableChangeDataFeed(spark, path) // v1: metadata only
    assert(DeltaLake.snapshot(spark, path).cdfEnabled)
    DeltaLake.updateWhere(spark, path, Map("v" -> lit(100L)),
      Some(col("k") < 4L)) // v2: update pre/post images
    DeltaLake.deleteWhere(spark, path, col("k") >= 38L) // v3: CoW delete images
    DeltaLake.deleteMergeOnRead(spark, path, col("k") === 10L) // v4: DV delete image
    DeltaLake.upsertByKey(spark, path,
      Seq((5L, 500L), (1000L, 1L)).toDF("k", "v"), "k") // v5: update + insert images
    val feed = DeltaLake.changeFeed(spark, path, 0L)
    assert(feed.schema.fieldNames.toSeq == Seq("k", "v", "_change_type", "_commit_version"))
    val byType = feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("insert") == 41L, s"40 bootstrap + 1 merge insert, got $byType")
    assert(byType("update_preimage") == 5L && byType("update_postimage") == 5L,
      s"4 UPDATE + 1 MERGE images, got $byType")
    assert(byType("delete") == 3L, s"2 CoW + 1 DV delete, got $byType")
    // images carry the right values: postimages of the UPDATE are 100
    assert(feed.filter(col("_commit_version") === 2L &&
      col("_change_type") === "update_postimage" && col("v") === 100L).count() == 4L)
    // the DV delete's image is the deleted row itself
    assert(feed.filter(col("_commit_version") === 4L).select("k").head().getLong(0) == 10L)
    // a window starting mid-history serves only its commits
    assert(DeltaLake.changeFeed(spark, path, 3L).select("_commit_version")
      .distinct().collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L, 5L))
    // the familiar option surface
    assert(spark.read.format("delta").option("readChangeFeed", "true")
      .option("startingVersion", "2").option("endingVersion", "3").load(path)
      .count() == 10L) // 4 pre + 4 post + 2 deletes
    // a mutation WITHOUT cdc (pre-enablement) gates the window loudly
    val p2 = freshDir("delta_cdf_gate")
    DeltaLake.write((0L until 10L).map(k => (k, k)).toDF("k", "v"), p2)
    DeltaLake.deleteWhere(spark, p2, col("k") === 0L) // v1: no cdc recorded
    val e = intercept[IllegalStateException](
      DeltaLake.changeFeed(spark, p2, 0L).count())
    assert(e.getMessage.contains("without cdc"))
    // vacuum never reclaims the change-data files
    DeltaLake.vacuum(spark, path)
    assert(DeltaLake.changeFeed(spark, path, 2L, Some(2L)).count() == 8L)
    // a checkpoint folds the table CONFIGURATION too — the feed must
    // stay enabled when the log is read checkpoint-first
    DeltaLake.checkpoint(spark, path)
    assert(DeltaLake.snapshot(spark, path).cdfEnabled,
      "enableChangeDataFeed must survive checkpoint folding")
  }

  test("readStream + readChangeFeed tails the feed: per-commit images, checkpointed resume") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val path = freshDir("delta_cdf_stream")
    DeltaLake.write((0L until 20L).map(k => (k, k % 3)).toDF("k", "v"), path)
    DeltaLake.enableChangeDataFeed(spark, path)
    val base = freshDir("delta_cdf_stream_tail")
    val sink = s"$base/sink"; val cp = s"$base/cp"
    def drain(): Unit = {
      val q = spark.readStream.format("delta")
        .option("readChangeFeed", "true").option("startingVersion", "0").load(path)
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", cp).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain() // bootstrap from v0: the derived inserts
    val boot = spark.read.parquet(sink)
    assert(boot.schema.fieldNames.toSeq == Seq("k", "v", "_change_type", "_commit_version"))
    assert(boot.count() == 20L &&
      boot.filter(col("_change_type") === "insert").count() == 20L)
    // a mutation lands; the resumed tail delivers exactly its images
    DeltaLake.updateWhere(spark, path, Map("v" -> lit(99L)), Some(col("k") < 2L))
    drain()
    val after = spark.read.parquet(sink)
    assert(after.count() == 24L, "resume must add 2 pre + 2 post images")
    assert(after.filter(col("_change_type") === "update_postimage" &&
      col("v") === 99L).count() == 2L)
    // a DV delete streams its delete images too
    DeltaLake.deleteMergeOnRead(spark, path, col("k") === 19L)
    drain()
    assert(spark.read.parquet(sink).filter(col("_change_type") === "delete").count() == 1L)
    // streaming a table without the feed enabled refuses loudly
    val p2 = freshDir("delta_cdf_stream_off")
    DeltaLake.write(Seq((1L, 1L)).toDF("k", "v"), p2)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("delta").option("readChangeFeed", "true").load(p2)
        .writeStream.format("memory").queryName("delta_cdf_off")
        .option("checkpointLocation", freshDir("delta_cdf_off_cp")).start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getCause.getMessage.contains("enableChangeDataFeed"))
  }

  test("mergeSchema append evolves the table additively; old files read NULL") {
    import spark.implicits._
    val path = freshDir("delta_evolve")
    DeltaLake.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), path)
    // appending a wider frame without mergeSchema stays a loud error
    val e = intercept[IllegalArgumentException](
      DeltaLake.write(Seq((3L, "c", 0.5)).toDF("k", "v", "score"), path,
        mode = SaveMode.Append))
    assert(e.getMessage.contains("mergeSchema"))
    // with mergeSchema: the union schema lands via a new metaData action
    DeltaLake.write(Seq((3L, "c", 0.5)).toDF("k", "v", "score"), path,
      mode = SaveMode.Append, mergeSchema = true)
    val got = DeltaLake.read(spark, path)
    assert(got.schema.fieldNames.toSeq == Seq("k", "v", "score"))
    assert(got.as[(Long, String, Option[Double])].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a", None), (2L, "b", None), (3L, "c", Some(0.5))))
    // a later append may OMIT the evolved column (its files lack it)
    DeltaLake.write(Seq((4L, "d")).toDF("k", "v"), path,
      mode = SaveMode.Append, mergeSchema = true)
    assert(DeltaLake.read(spark, path).count() == 4L)
    assert(DeltaLake.read(spark, path).filter(col("score").isNull).count() == 3L)
    // type conflicts refuse loudly
    val e2 = intercept[IllegalArgumentException](
      DeltaLake.write(Seq((5L, 9L, 0.1)).toDF("k", "v", "score"), path,
        mode = SaveMode.Append, mergeSchema = true))
    assert(e2.getMessage.contains("type conflict"))
    // the provider surface carries the familiar option
    Seq((6L, "f", 1.5)).toDF("k", "v", "score").write.format("delta")
      .mode("append").option("mergeSchema", "true").save(path)
    assert(spark.read.format("delta").load(path).count() == 5L)
  }

  test("compact bin-packs small files with dataChange=false; a tail survives it") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val path = freshDir("delta_compact")
    // 6 tiny single-row commits -> 6 small files
    for (k <- 0L until 6L)
      DeltaLake.write(Seq((k, k % 3)).toDF("k", "v"), path,
        mode = if (k == 0) SaveMode.Overwrite else SaveMode.Append)
    assert(DeltaLake.snapshot(spark, path).files.size == 6)
    // start a tail and drain the bootstrap (parquet sink: resumable)
    val base = freshDir("delta_compact_tail")
    val sink = s"$base/sink"; val cp = s"$base/cp"
    def drain(): Unit = {
      val q = spark.readStream.format("delta").load(path).writeStream
        .format("parquet").option("path", sink).option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(sink).count() == 6L)
    // compaction: files drop, data identical, dataChange=false recorded
    val v = DeltaLake.compact(spark, path, targetBytes = 1L << 20)
    assert(DeltaLake.snapshot(spark, path).files.size == 1,
      s"6 tiny files must bin-pack into one, got ${DeltaLake.snapshot(spark, path).files.size}")
    assert(DeltaLake.read(spark, path).count() == 6L)
    val logText = new String(java.nio.file.Files.readAllBytes(
      Paths.get(path, "_delta_log", f"$v%020d.json")), "UTF-8")
    assert(logText.contains("\"dataChange\":false") && !logText.contains("\"dataChange\":true"))
    // append after compaction; the resumed tail sees ONLY the new row —
    // the compaction commit is skipped, not gated on, not re-delivered
    DeltaLake.write(Seq((100L, 0L)).toDF("k", "v"), path, mode = SaveMode.Append)
    drain()
    assert(spark.read.parquet(sink).count() == 7L,
      "the tail must skip the dataChange=false commit and deliver only the append")
    // compaction also folds deletion-vector debt (row set unchanged)
    DeltaLake.deleteMergeOnRead(spark, path, col("k") === 100L)
    assert(DeltaLake.snapshot(spark, path).hasDeletionVectors)
    DeltaLake.compact(spark, path, targetBytes = 1L << 20)
    assert(!DeltaLake.snapshot(spark, path).hasDeletionVectors)
    assert(DeltaLake.read(spark, path).count() == 6L)
    // nothing left to do -> no commit
    val vNow = DeltaLake.versions(path).max
    assert(DeltaLake.compact(spark, path) == vNow)
  }

  test("SQL DELETE/UPDATE/MERGE on a delta catalog table land through the log") {
    import spark.implicits._
    val path = freshDir("delta_sqldml")
    DeltaLake.write((0L until 100L).map(k => (k, k % 7)).toDF("k", "v")
      .repartitionByRange(4, col("k")), path)
    spark.sql("DROP TABLE IF EXISTS delta_dml_t")
    spark.sql(s"CREATE TABLE delta_dml_t USING delta OPTIONS (path '$path')")
    // DELETE lands as deletion vectors: zero data files rewritten
    val before = DeltaLake.snapshot(spark, path)
    spark.sql("DELETE FROM delta_dml_t WHERE k >= 90")
    val after = DeltaLake.snapshot(spark, path)
    assert(after.files.map(_.path).toSet == before.files.map(_.path).toSet &&
      after.hasDeletionVectors, "SQL DELETE must land as a deletion vector")
    assert(spark.sql("SELECT count(*) FROM delta_dml_t").head().getLong(0) == 90L)
    // UPDATE is the copy-on-write rewrite of only the touched files
    spark.sql("UPDATE delta_dml_t SET v = v + 1000 WHERE k < 10")
    assert(spark.sql("SELECT sum(v) FROM delta_dml_t WHERE k < 10").head().getLong(0) ==
      (0L until 10L).map(k => k % 7 + 1000).sum)
    // MERGE upsert: one matched update + one insert
    Seq((5L, 777L), (500L, 1L)).toDF("k", "v").createOrReplaceTempView("delta_dml_src")
    spark.sql("""MERGE INTO delta_dml_t t USING delta_dml_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT v FROM delta_dml_t WHERE k = 5").head().getLong(0) == 777L)
    assert(spark.sql("SELECT count(*) FROM delta_dml_t").head().getLong(0) == 91L)
    // MERGE matched-DELETE: keyed merge-on-read delete
    Seq(500L).toDF("k").createOrReplaceTempView("delta_dml_del")
    spark.sql("""MERGE INTO delta_dml_t t USING delta_dml_del s ON t.k = s.k
      WHEN MATCHED THEN DELETE""")
    assert(spark.sql("SELECT count(*) FROM delta_dml_t").head().getLong(0) == 90L)
    assert(spark.sql("SELECT count(*) FROM delta_dml_t WHERE k = 500").head().getLong(0) == 0L)
    spark.sql("DROP TABLE delta_dml_t")
  }

  test("format(\"delta\") serves the familiar read/write surface") {
    import spark.implicits._
    val path = freshDir("delta_fmt")
    Seq((1L, "a", "F"), (2L, "b", "O")).toDF("k", "v", "status")
      .write.format("delta").partitionBy("status").save(path)
    Seq((3L, "c", "F")).toDF("k", "v", "status")
      .write.format("delta").mode("append").save(path)
    assert(spark.read.format("delta").load(path).count() == 3L)
    assert(spark.read.format("delta").option("versionAsOf", "0").load(path).count() == 2L)
    // the provider wrote a real Delta log, not a parquet dir
    assert(DeltaLake.versions(path) == Seq(0L, 1L))
    val f = spark.read.format("delta").load(path).filter(col("status") === "O")
    assert(f.count() == 1L)
    val (kept, total) = org.apache.spark.sql.graft.VersionedFileIndex.lastPlanned(path).get
    assert(kept < total, s"format(delta) read must prune partitions ($kept/$total)")
  }

  test("readStream.format(\"delta\") tails the log: snapshot bootstrap, O(new) batches, rewrite gate") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = freshDir("delta_stream")
    val path = s"$base/tbl"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
    Seq((1L, "a", "F"), (2L, "b", "O")).toDF("k", "v", "status")
      .write.format("delta").partitionBy("status").save(path)
    Seq((3L, "c", "F")).toDF("k", "v", "status")
      .write.format("delta").mode("append").save(path)
    def drainOnce(): Unit = {
      val q = spark.readStream.format("delta").load(path)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drainOnce() // bootstrap: the LIVE snapshot (both versions), partition values intact
    val got = spark.read.parquet(sink).as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a", "F"), (2L, "b", "O"), (3L, "c", "F")))
    // tail: only the new commit's adds stream on resume (exactly once)
    Seq((4L, "d", "O")).toDF("k", "v", "status")
      .write.format("delta").mode("append").save(path)
    drainOnce()
    assert(spark.read.parquet(sink).count() == 4L, "resume must deliver only the new commit")
    // a rewrite (remove actions) breaks the tail loudly...
    Seq((9L, "z", "P")).toDF("k", "v", "status")
      .write.format("delta").mode("overwrite").partitionBy("status").save(path)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](drainOnce())
    assert(e.getMessage.contains("remove actions") || e.getCause.getMessage.contains("remove actions"))
    // ...unless ignoreChanges re-emits the rewritten version's files
    val q2 = spark.readStream.format("delta").option("ignoreChanges", "true").load(path)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.read.parquet(sink).count() == 5L)
  }

  test("deleteWhere is copy-on-write at file granularity: untouched files carried by reference") {
    import spark.implicits._
    val path = freshDir("delta_del")
    // 4 disjoint key-range files; the predicate hits exactly one range
    val df = spark.range(0, 400).select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(4, col("k"))
    DeltaLake.write(df, path)
    val before = DeltaLake.snapshot(spark, path).files.map(_.path).toSet
    assert(before.size == 4)
    val v = DeltaLake.deleteWhere(spark, path, col("k") >= 100L && col("k") < 150L)
    assert(v == 1L)
    val after = DeltaLake.snapshot(spark, path)
    // exactly the one file holding 100..149 was rewritten; 3 carried
    assert(before.intersect(after.files.map(_.path).toSet).size == 3,
      "untouched files must stay live by reference")
    assert(DeltaLake.read(spark, path).count() == 350L)
    assert(DeltaLake.read(spark, path).filter(col("k") === 120L).count() == 0L)
    assert(DeltaLake.read(spark, path).filter(col("k") === 99L).count() == 1L)
    // time travel still serves the pre-delete snapshot
    assert(DeltaLake.read(spark, path, versionAsOf = Some(0L)).count() == 400L)
    // a no-match delete commits nothing
    assert(DeltaLake.deleteWhere(spark, path, col("k") === -1L) == 1L)
    assert(DeltaLake.versions(path) == Seq(0L, 1L))
    // partitioned table: predicate on the partition column rewrites
    // only that partition's files, survivors keep their partition value
    val p2 = freshDir("delta_del_part")
    DeltaLake.write(Seq((1L, "x", "F"), (2L, "y", "O"), (3L, "z", "F")).toDF("k", "v", "s"),
      p2, partitionBy = Seq("s"))
    DeltaLake.deleteWhere(spark, p2, col("s") === "F" && col("k") === 1L)
    val got = DeltaLake.read(spark, p2).as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((2L, "y", "O"), (3L, "z", "F")))
  }

  test("upsertByKey is copy-on-write MERGE: matched files rewritten, updates land, rest carried") {
    import spark.implicits._
    val path = freshDir("delta_merge")
    val df = spark.range(0, 400).select(col("id").as("k"), (col("id") % 7).cast("long").as("v"))
      .repartitionByRange(4, col("k"))
    DeltaLake.write(df, path)
    val before = DeltaLake.snapshot(spark, path).files.map(_.path).toSet
    // update two keys in ONE range file, insert one brand-new key
    val updates = Seq((110L, 999L), (120L, 998L), (9000L, 42L)).toDF("k", "v")
    val v = DeltaLake.upsertByKey(spark, path, updates, "k")
    assert(v == 1L)
    val after = DeltaLake.snapshot(spark, path)
    assert(before.intersect(after.files.map(_.path).toSet).size == 3,
      "only the matched range file may be rewritten")
    val got = DeltaLake.read(spark, path)
    assert(got.count() == 401L)
    assert(got.filter(col("k") === 110L).head().getLong(1) == 999L)
    assert(got.filter(col("k") === 9000L).head().getLong(1) == 42L)
    assert(got.filter(col("k") === 119L).head().getLong(1) == 119L % 7)
    // time travel serves the pre-merge image
    assert(DeltaLake.read(spark, path, versionAsOf = Some(0L)).count() == 400L)
  }

  test("SQL INSERT INTO a delta catalog table lands as a log commit, never as raw files") {
    import spark.implicits._
    val path = freshDir("delta_sql")
    Seq((1L, "a")).toDF("k", "v").write.format("delta").save(path)
    spark.sql("DROP TABLE IF EXISTS delta_sql_t")
    spark.sql(s"CREATE TABLE delta_sql_t USING delta OPTIONS (path '$path')")
    Seq((2L, "b"), (3L, "c")).toDF("k", "v").createOrReplaceTempView("delta_sql_src")
    spark.sql("INSERT INTO delta_sql_t SELECT k, v FROM delta_sql_src")
    // the insert MUST be a log commit: version advanced, rows visible to
    // the library reader (raw files outside the log would be invisible)
    assert(DeltaLake.versions(path) == Seq(0L, 1L),
      "INSERT INTO must land as exactly one Delta log commit")
    assert(DeltaLake.read(spark, path).count() == 3L)
    spark.sql("REFRESH TABLE delta_sql_t")
    assert(spark.sql("SELECT count(*) FROM delta_sql_t").head().getLong(0) == 3L)
    spark.sql("DROP TABLE delta_sql_t")
  }

  test("history and timestampAsOf resolve off commitInfo timestamps") {
    import spark.implicits._
    val path = freshDir("delta_hist")
    DeltaLake.write(Seq((1L, "a")).toDF("k", "v"), path)
    DeltaLake.write(Seq((2L, "b")).toDF("k", "v"), path, mode = SaveMode.Append)
    val hist = spark.read.format("delta").option("history", "true").load(path)
      .orderBy("version").collect()
    assert(hist.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(hist.last.getString(2) == "WRITE")
    // timestampAsOf at v0's commit time serves v0's single row
    val t0 = DeltaLake.commitsWithTimes(path).head._2
    val ts0 = new java.sql.Timestamp(t0).toString.takeWhile(_ != '.')
    // both versions may share a wall-clock second; assert the resolved
    // VERSION bound rather than a row count race
    assert(DeltaLake.versionAsOf(path, t0) >= 0L)
    assert(spark.read.format("delta").option("timestampAsOf", ts0 + ".999")
      .load(path).count() >= 1L)
    intercept[IllegalArgumentException](DeltaLake.versionAsOf(path, t0 - 100000L))
  }

  test("vacuum reclaims files the live snapshot no longer references") {
    import spark.implicits._
    val path = freshDir("delta_vac")
    val df = spark.range(0, 400).select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(4, col("k"))
    DeltaLake.write(df, path)
    DeltaLake.deleteWhere(spark, path, col("k") >= 100L && col("k") < 150L) // 1 file rewritten
    val reclaimed = DeltaLake.vacuum(spark, path)
    assert(reclaimed == 1, s"exactly the rewritten file should be reclaimed, got $reclaimed")
    // the live snapshot is untouched
    assert(DeltaLake.read(spark, path).count() == 350L)
    // a second vacuum is a no-op
    assert(DeltaLake.vacuum(spark, path) == 0)
    // history metadata is still inspectable even though v0 can't be scanned
    assert(DeltaLake.commitsWithTimes(path).map(_._1) == Seq(0L, 1L))
  }

  test("the writer folds a checkpoint automatically every 10 commits") {
    import spark.implicits._
    val path = freshDir("delta_autocp")
    DeltaLake.write(Seq((0L, "r")).toDF("k", "v"), path)
    for (i <- 1 to 10)
      DeltaLake.write(Seq((i.toLong, "r")).toDF("k", "v"), path, mode = SaveMode.Append)
    // v10 crossed the fold threshold: checkpoint + _last_checkpoint exist
    assert(java.nio.file.Files.exists(
      Paths.get(path, "_delta_log", f"${10L}%020d.checkpoint.parquet")))
    val lc = new String(java.nio.file.Files.readAllBytes(
      Paths.get(path, "_delta_log", "_last_checkpoint")), "UTF-8")
    assert(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(lc).get("version").asLong == 10L)
    assert(DeltaLake.read(spark, path).count() == 11L)
  }

  test("a streaming tail with startingVersion skips the backlog") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val base = freshDir("delta_sv")
    val path = s"$base/tbl"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
    DeltaLake.write(Seq((1L, "old")).toDF("k", "v"), path)
    Seq((2L, "new")).toDF("k", "v").write.format("delta").mode("append").save(path)
    val q = spark.readStream.format("delta").option("startingVersion", "1").load(path)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(sink).as[(Long, String)].collect()
    assert(got.toSeq == Seq((2L, "new")), s"startingVersion=1 must skip v0, got ${got.toSeq}")
  }

  test("racing appends arbitrate on the atomic version-file create: no lost update, no gap") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val path = freshDir("delta_race")
    DeltaLake.write(Seq((0L, "base")).toDF("k", "v"), path)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val attempts = (1 to 4).map { i =>
      Future {
        gate.await()
        try Right(DeltaLake.write(Seq((i.toLong, s"w$i")).toDF("k", "v"), path,
          mode = SaveMode.Append))
        catch { case e: java.util.ConcurrentModificationException => Left(e) }
      }
    }
    gate.countDown()
    val results = Await.result(Future.sequence(attempts), 120.seconds)
    val wins = results.collect { case Right(v) => v }
    assert(wins.nonEmpty, "at least one racing append must land")
    assert(wins.distinct.size == wins.size, s"two appends claimed one version: $wins")
    // every version that exists is readable and contiguous, and the live
    // rows are exactly base + the winners (no lost update, no phantom)
    assert(DeltaLake.versions(path) == (0L to wins.max))
    assert(DeltaLake.read(spark, path).count() == 1L + wins.size)
  }

  test("restore rewinds the live set as one metadata-only diff commit") {
    import spark.implicits._
    val path = freshDir("delta_restore")
    val orig = (0L until 50L).map(k => (k, k % 3)).toDF("k", "v")
    DeltaLake.write(orig.repartitionByRange(2, col("k")), path)                 // v0
    DeltaLake.write(Seq((999L, 9L)).toDF("k", "v"), path)                       // v1 overwrite
    DeltaLake.deleteMergeOnRead(spark, path, col("k") === 999L)                 // v2 (DV)
    val before = listDataFiles(path)
    val v = DeltaLake.restore(spark, path, 0L)
    assert(v == 3L)
    // metadata only: restore created NO new data files
    assert(listDataFiles(path) == before, "restore must not write data files")
    val got = DeltaLake.read(spark, path).as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == (0L until 50L).map(k => (k, k % 3)))
    // the abandoned versions stay time-travelable
    assert(DeltaLake.read(spark, path, Some(1L)).count() == 1L)
    // restoring to the current state is a no-op (no empty commit)
    assert(DeltaLake.restore(spark, path, 3L) == 3L)
    assert(DeltaLake.versions(path).max == 3L)
    // a DV'd target round-trips: restore to v2's deleted-empty state
    assert(DeltaLake.restore(spark, path, 2L) == 4L)
    assert(DeltaLake.read(spark, path).count() == 0L)
  }

  private def listDataFiles(path: String): Set[String] = {
    val d = Paths.get(path)
    val s = java.nio.file.Files.walk(d)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && !p.toString.contains("_delta_log"))
        .map(_.toString).toSet
    } finally s.close()
  }

  test("MERGE star actions with clause conditions refuse instead of dropping the condition") {
    import spark.implicits._
    val path = freshDir("delta_merge_cond")
    DeltaLake.write(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), path)
    spark.sql("DROP TABLE IF EXISTS delta_mc_t")
    spark.sql(s"CREATE TABLE delta_mc_t USING delta OPTIONS (path '$path')")
    Seq((1L, 111L), (3L, 333L)).toDF("k", "v").createOrReplaceTempView("delta_mc_src")
    // UpdateStarAction(Some(cond)): an unconditional Upsert here would
    // overwrite rows the condition was meant to protect
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO delta_mc_t t USING delta_mc_src s ON t.k = s.k
        WHEN MATCHED AND t.v = 10 THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("unsupported clause shape")), s"got: $msgs")
    // the refusal left the table untouched
    assert(spark.sql("SELECT sum(v) FROM delta_mc_t").head().getLong(0) == 30L)
    assert(spark.sql("SELECT count(*) FROM delta_mc_t").head().getLong(0) == 2L)
    spark.sql("DROP TABLE delta_mc_t")
  }

  test("timestamp stats: spec UTC-ISO in the log, canonical session compare at plan time") {
    import spark.implicits._
    val path = freshDir("delta_ts_stats")
    val rows = (0 until 24).map(h =>
      (h.toLong, java.sql.Timestamp.valueOf(f"2024-01-15 $h%02d:00:00")))
    DeltaLake.write(rows.toDF("k", "ts").repartitionByRange(4, col("ts")), path)
    // the log records protocol-shaped zone-independent ISO-8601 (`Z`)
    val logDir = Paths.get(path, "_delta_log")
    val log = new String(java.nio.file.Files.readAllBytes(
      logDir.resolve("0" * 20 + ".json")), "UTF-8")
    assert("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z""".r.findFirstIn(log).isDefined,
      "timestamp stats must be spec UTC ISO-8601 in the log")
    // a same-day upper bound must NOT prune the files holding matches
    // (an uncanonicalized 'T' rendering compares past ' ' and drops them)
    val morning = spark.read.format("delta").load(path)
      .filter(col("ts") <= lit(java.sql.Timestamp.valueOf("2024-01-15 08:00:00")))
    assert(morning.count() == 9L, "same-day bound lost rows to stats mis-pruning")
    // and the canonicalized bounds really do prune at the manifest
    val narrow = spark.read.format("delta").load(path)
      .filter(col("ts") === lit(java.sql.Timestamp.valueOf("2024-01-15 01:00:00")))
    assert(narrow.count() == 1L)
    val (kept, total) = org.apache.spark.sql.graft.VersionedFileIndex.lastPlanned(path).get
    assert(total == 4 && kept < total,
      s"canonicalized timestamp bounds must skip whole files ($kept/$total)")
    // foreign-writer shapes all land in the same compare domain
    val utc = java.time.ZoneId.of("UTC")
    assert(StatsTime.canonicalize("2024-01-15T08:00:00.123Z", utc, ceil = false) ==
      "2024-01-15 08:00:00")
    assert(StatsTime.canonicalize("2024-01-15T08:00:00.123Z", utc, ceil = true) ==
      "2024-01-15 08:00:01")
    assert(StatsTime.canonicalize("2024-01-15T03:30:00-05:00", utc, ceil = false) ==
      "2024-01-15 08:30:00")
    assert(StatsTime.canonicalize("not a timestamp", utc, ceil = false) == "not a timestamp")
  }

  test("row tracking: enable backfills, writes assign ranges, DV deletes preserve ids") {
    import spark.implicits._
    val path = freshDir("delta_rowtrack")
    DeltaLake.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), path)
    DeltaLake.enableRowTracking(spark, path)
    DeltaLake.enableRowTracking(spark, path) // idempotent
    val s1 = DeltaLake.snapshot(spark, path)
    assert(s1.rowTrackingEnabled && s1.rowIdHighWaterMark == 1L)
    assert(s1.protocol.minWriter == 7 &&
      Set("rowTracking", "domainMetadata").subsetOf(s1.protocol.writerFeatures.toSet))
    assert(s1.files.forall(f =>
      f.baseRowId.nonEmpty && f.defaultRowCommitVersion.contains(1L)))
    def lineage(): Map[Long, (Option[Long], Option[Long])] =
      DeltaLake.readWithRowTracking(spark, path)
        .select("k", "_row_id", "_row_commit_version")
        .as[(Long, Option[Long], Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    val lin1 = lineage()
    assert(lin1(1L)._1 == Some(0L) && lin1(2L)._1 == Some(1L),
      "the backfill assigns ids by position")
    assert(lin1.values.forall(_._2 == Some(1L)))
    // each append takes the next id range and advances the watermark
    DeltaLake.write(Seq((3L, "c")).toDF("k", "v").coalesce(1), path,
      mode = SaveMode.Append)
    val lin2 = lineage()
    assert(lin2(3L) == ((Some(2L), Some(2L))))
    assert(DeltaLake.snapshot(spark, path).rowIdHighWaterMark == 2L)
    // a merge-on-read (deletion-vector) delete keeps survivors' ids
    DeltaLake.deleteMergeOnRead(spark, path, col("k") === 1L)
    val lin3 = lineage()
    assert(lin3.keySet == Set(2L, 3L))
    assert(lin3(2L) == lin2(2L) && lin3(3L) == lin2(3L))
    // the checkpoint folds the watermark, the domain, and the per-file
    // defaults: a vacuumed JSON tail must not reissue ids
    DeltaLake.checkpoint(spark, path)
    val logDir = Paths.get(path, "_delta_log")
    java.nio.file.Files.list(logDir).toArray.map(_.toString)
      .filter(_.endsWith(".json"))
      .foreach(p => java.nio.file.Files.delete(Paths.get(p)))
    val s4 = DeltaLake.snapshot(spark, path)
    assert(s4.rowIdHighWaterMark == 2L, "the watermark must survive the fold")
    assert(s4.files.forall(_.baseRowId.nonEmpty))
    assert(lineage() == lin3, "lineage must survive a checkpoint-only replay")
    // id-preserving rewrites: compaction MATERIALIZES every surviving
    // row's id into the replacement file (folding the DV along the way)
    DeltaLake.compact(spark, path, targetBytes = 1L << 20)
    val lin6 = lineage()
    assert(lin6 == lin3, "compaction must not disturb row identity")
    val compacted = DeltaLake.snapshot(spark, path)
    assert(compacted.files.size == 1 && compacted.files.forall(_.dv.isEmpty))
    val matCols = spark.read.parquet(path + "/" + compacted.files.head.path).columns
    assert(matCols.exists(_.startsWith("_row-id-col-")) &&
      matCols.exists(_.startsWith("_row-commit-version-col-")),
      s"the rewritten file must materialize the tracking columns, got ${matCols.toSeq}")
    // COW UPDATE: the changed row keeps its id and bumps its commit
    // version; its file-mates carry both through unchanged
    DeltaLake.updateWhere(spark, path, Map("v" -> lit("x")), Some(col("k") === 2L))
    val lin7 = lineage()
    assert(lin7(2L)._1 == lin3(2L)._1, "an updated row keeps its _row_id")
    assert(lin7(2L)._2.exists(v2 => lin3(2L)._2.exists(_ < v2)))
    assert(lin7(3L) == lin3(3L))
    // COW DELETE: survivors keep their identity
    DeltaLake.deleteWhere(spark, path, col("k") === 2L)
    val lin8 = lineage()
    assert(lin8.keySet == Set(3L) && lin8(3L) == lin3(3L))
    // MERGE: the matched image inherits its row's id; the insert mints
    // a fresh one from the new file's range
    DeltaLake.upsertByKey(spark, path, Seq((3L, "upd"), (7L, "new")).toDF("k", "v"), "k")
    val lin9 = lineage()
    assert(lin9(3L)._1 == lin3(3L)._1, "a merged update keeps its _row_id")
    assert(lin9(3L)._2.exists(v9 => lin3(3L)._2.exists(_ < v9)))
    assert(lin9(7L)._1.nonEmpty && lin9(7L)._1 != lin9(3L)._1)
    // overwrite: replaced rows die, fresh rows mint past the watermark
    val hwmBefore = DeltaLake.snapshot(spark, path).rowIdHighWaterMark
    DeltaLake.write(Seq((9L, "z")).toDF("k", "v").coalesce(1), path,
      mode = SaveMode.Overwrite)
    val lin5 = lineage()
    assert(lin5.keySet == Set(9L) && lin5(9L)._1 == Some(hwmBefore + 1))
    // plain reads stay clean — no tracking columns leak
    assert(DeltaLake.read(spark, path).columns.toSeq == Seq("k", "v"))
    // the format("delta") surface serves the same tracked read
    val viaOpt = spark.read.format("delta").option("rowTracking", "true").load(path)
    assert(viaOpt.columns.takeRight(2).toSeq == Seq("_row_id", "_row_commit_version"))
    assert(viaOpt.count() == 1L)
  }

  test("in-commit timestamps: monotone first-action stamps drive timestamp travel") {
    import spark.implicits._
    val path = freshDir("delta_ict")
    DeltaLake.write(Seq((1L, "a")).toDF("k", "v"), path)                    // v0
    DeltaLake.enableInCommitTimestamps(spark, path)                         // v1
    DeltaLake.write(Seq((2L, "b")).toDF("k", "v"), path,
      mode = SaveMode.Append)                                               // v2
    DeltaLake.deleteMergeOnRead(spark, path, col("k") === 1L)               // v3
    def ictOf(v: Long): Option[Long] = {
      val text = new String(java.nio.file.Files.readAllBytes(
        Paths.get(path, "_delta_log", f"$v%020d.json")), "UTF-8")
      val first = text.split('\n').head
      val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(first)
      // the spec: commitInfo with the stamp must be the FIRST action
      Option(n.get("commitInfo")).filterNot(_.isNull)
        .flatMap(c => Option(c.get("inCommitTimestamp")).filterNot(_.isNull).map(_.asLong))
    }
    assert(ictOf(0L).isEmpty, "pre-enablement commits carry no stamp")
    val Seq(i1, i2, i3) = Seq(1L, 2L, 3L).map(v => ictOf(v).getOrElse(
      fail(s"commit $v must lead with a stamped commitInfo")))
    assert(i1 < i2 && i2 < i3, s"stamps must be strictly monotone: $i1 $i2 $i3")
    // provenance + protocol
    val snap = DeltaLake.snapshot(spark, path)
    assert(snap.configuration("delta.inCommitTimestampEnablementVersion") == "1")
    assert(snap.protocol.writerFeatures.contains("inCommitTimestamp"))
    // timestamp travel resolves against the stamps, immune to file
    // mtimes — push every log file's mtime far into the future
    java.nio.file.Files.list(Paths.get(path, "_delta_log")).toArray
      .map(_.toString).filter(_.endsWith(".json")).foreach { f =>
        java.nio.file.Files.setLastModifiedTime(Paths.get(f),
          java.nio.file.attribute.FileTime.fromMillis(i3 + 3600_000L))
      }
    assert(DeltaLake.versionAsOf(path, i2) == 2L)
    assert(DeltaLake.versionAsOf(path, i3 - 1) == 2L)
    assert(DeltaLake.versionAsOf(path, i3) == 3L)
    assert(DeltaLake.read(spark, path,
      versionAsOf = Some(DeltaLake.versionAsOf(path, i2))).count() == 2L)
  }

  test("row tracking composes with column mapping") {
    import spark.implicits._
    val path = freshDir("delta_rowtrack_cm")
    DeltaLake.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1), path,
      columnMapping = Some("name"))
    DeltaLake.enableRowTracking(spark, path)
    DeltaLake.renameColumn(spark, path, "v", "label")
    DeltaLake.write(Seq((3L, "c")).toDF("k", "label").coalesce(1), path,
      mode = SaveMode.Append)
    val lin = DeltaLake.readWithRowTracking(spark, path)
      .select("k", "label", "_row_id").as[(Long, String, Option[Long])]
      .collect().sortBy(_._1)
    assert(lin.map(_._3).toSeq == Seq(Some(0L), Some(1L), Some(2L)))
    assert(lin.map(_._2).toSeq == Seq("a", "b", "c"))
  }
}
