package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg PARTITION-SPEC EVOLUTION (the table spec's
  * `partition-specs` list + manifest-list field 502): multi-spec
  * resolution on read, per-spec pruning, the [[Iceberg.replaceSpec]]
  * metadata-only write surface, per-spec manifest bin-packing, and the
  * honest gates (unknown spec id, identity-set drift). */
class PartitionEvolutionSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def ts(s: String): java.time.LocalDateTime =
    java.time.LocalDateTime.parse(s.replace(' ', 'T'))

  private def daysDf(rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "ts", "v")
  }

  /** Rewrite a metadata file in place, dropping the local FS's stale
    * sidecar checksum so the doctored bytes actually read back. */
  private def writeDoctored(metaPath: java.nio.file.Path, text: String): Unit = {
    Files.write(metaPath, text.getBytes("UTF-8"))
    Files.deleteIfExists(metaPath.resolveSibling("." + metaPath.getFileName + ".crc")): Unit
  }

  private def metaJson(path: String): com.fasterxml.jackson.databind.JsonNode = {
    val dir = Paths.get(path, "metadata")
    val v = Files.list(dir).iterator()
    val vs = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    while (v.hasNext) { val p = v.next(); if (p.toString.endsWith(".metadata.json")) vs += p }
    val latest = vs.maxBy(_.getFileName.toString)
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      new String(Files.readAllBytes(latest), "UTF-8"))
  }

  test("daily -> hourly: metadata-only evolution; both specs read and prune") {
    val path = freshDir("ice_evo")
    // era 1: two days, partitioned days(ts)
    Iceberg.write(daysDf(Seq(
      (1L, "2024-01-01 03:00:00", "a"), (2L, "2024-01-01 15:00:00", "b"),
      (3L, "2024-01-02 09:00:00", "c"))), path, partitionBy = Seq("days(ts)"))
    val filesBefore = Iceberg.snapshot(spark, path).files.map(_.path).sorted
    // evolve to hourly — pure metadata
    val newSpec = Iceberg.replaceSpec(spark, path, Seq("hours(ts)"))
    assert(newSpec == 1)
    assert(Iceberg.snapshot(spark, path).files.map(_.path).sorted == filesBefore,
      "replaceSpec must move zero data files")
    val meta = metaJson(path)
    assert(meta.get("default-spec-id").asInt == 1)
    assert(meta.get("partition-specs").size == 2, "old spec must stay listed")
    // era 2: hourly appends
    Iceberg.write(daysDf(Seq(
      (4L, "2024-01-03 05:30:00", "d"), (5L, "2024-01-03 06:30:00", "e"))),
      path, mode = SaveMode.Append)
    val s = Iceberg.snapshot(spark, path)
    assert(s.files.count(_.specId == 0) == filesBefore.size &&
      s.files.count(_.specId == 1) == s.files.size - filesBefore.size &&
      s.files.size > filesBefore.size,
      s"per-file spec ids: ${s.files.map(f => (f.path, f.specId))}")
    // old files key by ts_day, new ones by ts_hour
    assert(s.files.filter(_.specId == 0).forall(_.partitionValues.keySet == Set("ts_day")))
    assert(s.files.filter(_.specId == 1).forall(_.partitionValues.keySet == Set("ts_hour")))
    // full read serves both eras
    import spark.implicits._
    val got = Iceberg.read(spark, path).select("k", "v").as[(Long, String)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")))
    // pruning maps through EACH file's own transform: an equality on ts
    // inside era 1 keeps exactly the one matching day file...
    def plannedFor(t: String): (Int, Int) = {
      Iceberg.read(spark, path)
        .filter(col("ts") === java.sql.Timestamp.valueOf(t)).count()
      org.apache.spark.sql.graft.VersionedFileIndex.lastPlanned(path).get
    }
    val (kept1, total) = plannedFor("2024-01-02 09:00:00")
    assert(total == s.files.size && kept1 == 1,
      s"era-1 probe kept $kept1/$total (want 1/${s.files.size})")
    // ...and inside era 2 the one matching hour file
    val (kept2, _) = plannedFor("2024-01-03 06:30:00")
    assert(kept2 == 1, s"era-2 probe kept $kept2 (want 1)")
  }

  test("replaceSpec is idempotent and repoints to an old spec without re-minting") {
    val path = freshDir("ice_evo_idem")
    Iceberg.write(daysDf(Seq((1L, "2024-01-01 03:00:00", "a"))),
      path, partitionBy = Seq("days(ts)"))
    assert(Iceberg.replaceSpec(spark, path, Seq("hours(ts)")) == 1)
    val metaV1 = metaJson(path).get("last-updated-ms").asLong
    // same layout again: pure no-op (no commit)
    assert(Iceberg.replaceSpec(spark, path, Seq("hours(ts)")) == 1)
    assert(metaJson(path).get("last-updated-ms").asLong == metaV1)
    // back to daily: repoints to spec 0, list stays at 2 specs
    assert(Iceberg.replaceSpec(spark, path, Seq("days(ts)")) == 0)
    val meta = metaJson(path)
    assert(meta.get("default-spec-id").asInt == 0)
    assert(meta.get("partition-specs").size == 2)
    // partition FIELD ids never recycle: hours(ts) re-minted in a wider
    // spec keeps its id, the fresh bucket field takes the next one
    assert(Iceberg.replaceSpec(spark, path, Seq("hours(ts)", "bucket(4, k)")) == 2)
    val specs = metaJson(path).get("partition-specs")
    val spec2 = (0 until specs.size).map(specs.get).find(_.get("spec-id").asInt == 2).get
    val byName = (0 until spec2.get("fields").size).map(spec2.get("fields").get)
      .map(f => f.get("name").asText -> f.get("field-id").asInt).toMap
    assert(byName("ts_hour") == 1001, s"ts_hour must keep its field id, got $byName")
    assert(byName("k_bucket") == 1002, s"fresh combo takes last-partition-id+1, got $byName")
  }

  test("identity-set changes refuse while live files exist; an empty table may") {
    import spark.implicits._
    val path = freshDir("ice_evo_ident")
    Iceberg.write(Seq((1L, "x", "F")).toDF("k", "v", "status"),
      path, partitionBy = Seq("status"))
    val e = intercept[IllegalArgumentException] {
      Iceberg.replaceSpec(spark, path, Seq("v"))
    }
    assert(e.getMessage.contains("identity"), e.getMessage)
    // transform fields evolve freely around a stable identity set
    assert(Iceberg.replaceSpec(spark, path, Seq("status", "bucket(4, k)")) == 1)
    // an EMPTY table (a written-empty overwrite) has no live layout to protect
    val empty = freshDir("ice_evo_ident2")
    Iceberg.write(Seq.empty[(Long, String, String)].toDF("k", "v", "status"),
      empty, partitionBy = Seq("status"))
    assert(Iceberg.replaceSpec(spark, empty, Seq("v")) == 1)
  }

  test("rewriteManifests bin-packs PER SPEC and stamps each merged manifest's spec id") {
    val path = freshDir("ice_evo_rwm")
    Iceberg.write(daysDf(Seq((1L, "2024-01-01 03:00:00", "a"))),
      path, partitionBy = Seq("days(ts)"))
    Iceberg.write(daysDf(Seq((2L, "2024-01-01 04:00:00", "b"))),
      path, mode = SaveMode.Append)
    Iceberg.replaceSpec(spark, path, Seq("hours(ts)"))
    Iceberg.write(daysDf(Seq((3L, "2024-01-02 05:00:00", "c"))),
      path, mode = SaveMode.Append)
    Iceberg.write(daysDf(Seq((4L, "2024-01-02 06:00:00", "d"))),
      path, mode = SaveMode.Append)
    val (before, after) = Iceberg.rewriteManifests(spark, path)
    assert(before == 4 && after == 2,
      s"four single-append manifests must fold to one per spec, got $before -> $after")
    val mfs = Iceberg.manifestsTable(spark, path)
    assert(mfs.count() == 2)
    // the merged manifests decode: per-file spec ids and values survive
    val s = Iceberg.snapshot(spark, path)
    assert(s.files.count(_.specId == 0) == 2 && s.files.count(_.specId == 1) == 2)
    assert(s.files.filter(_.specId == 1).forall(_.partitionValues.keySet == Set("ts_hour")))
    import spark.implicits._
    assert(Iceberg.read(spark, path).select("k").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("copy-on-write across eras re-emits each touched manifest under its own spec") {
    val path = freshDir("ice_evo_cow")
    // one era-1 file holding BOTH rows, so deleting one row forces a
    // genuine copy-on-write restage of the survivor
    Iceberg.write(daysDf(Seq(
      (1L, "2024-01-01 03:00:00", "a"), (2L, "2024-01-01 15:00:00", "b")))
      .coalesce(1), path, partitionBy = Seq("days(ts)"))
    Iceberg.replaceSpec(spark, path, Seq("hours(ts)"))
    Iceberg.write(daysDf(Seq((3L, "2024-01-03 05:30:00", "c"))),
      path, mode = SaveMode.Append)
    // copy-on-write delete touches BOTH eras' files
    Iceberg.deleteWhere(spark, path, col("k").isin(1L, 3L))
    import spark.implicits._
    assert(Iceberg.read(spark, path).select("k").as[Long].collect().toSeq == Seq(2L))
    // replacement files staged under the DEFAULT (hourly) spec
    val s = Iceberg.snapshot(spark, path)
    assert(s.files.nonEmpty && s.files.forall(_.specId == 1),
      s"rewritten files must land under the default spec: ${s.files.map(_.specId)}")
  }

  test("a manifest under a spec id missing from partition-specs refuses loudly") {
    val path = freshDir("ice_evo_gate")
    Iceberg.write(daysDf(Seq((1L, "2024-01-01 03:00:00", "a"))),
      path, partitionBy = Seq("days(ts)"))
    // doctor the metadata: drop spec 0 from the list, repoint default to
    // a minted spec 9 — the committed manifest still says spec 0
    val metaPath = Paths.get(path, "metadata", "v00001.metadata.json")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val m = om.readTree(new String(Files.readAllBytes(metaPath), "UTF-8"))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val specs = m.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("partition-specs")
    specs.get(0).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .put("spec-id", 9)
    m.put("default-spec-id", 9)
    writeDoctored(metaPath, om.writerWithDefaultPrettyPrinter().writeValueAsString(m))
    val e = intercept[IllegalArgumentException] {
      Iceberg.read(spark, path).count()
    }
    assert(e.getMessage.contains("partition spec 0"), e.getMessage)
  }

  test("specs whose IDENTITY fields drifted apart refuse loudly at read") {
    import spark.implicits._
    val path = freshDir("ice_evo_drift")
    Iceberg.write(Seq((1L, "x", "F")).toDF("k", "v", "status"),
      path, partitionBy = Seq("status"))
    // doctor: a NEW default spec whose identity set differs, with the
    // old manifest still live under spec 0 — the foreign-table shape
    // this library cannot serve (identity values live in manifests)
    val metaPath = Paths.get(path, "metadata", "v00001.metadata.json")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val m = om.readTree(new String(Files.readAllBytes(metaPath), "UTF-8"))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val specs = m.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("partition-specs")
    val spec1 = specs.addObject()
    spec1.put("spec-id", 1)
    val f1 = spec1.putArray("fields").addObject()
    f1.put("name", "v"); f1.put("transform", "identity")
    f1.put("source-id", 2); f1.put("field-id", 1001)
    m.put("default-spec-id", 1)
    writeDoctored(metaPath, om.writerWithDefaultPrettyPrinter().writeValueAsString(m))
    val e = intercept[IllegalArgumentException] {
      Iceberg.read(spark, path).count()
    }
    assert(e.getMessage.contains("identity"), e.getMessage)
  }
}
