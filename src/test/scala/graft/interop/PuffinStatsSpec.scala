package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg PUFFIN TABLE STATISTICS (r11 verdict next #5): ANALYZE
  * publishes apache-datasketches-theta ndv blobs in a Puffin file plus
  * the spec's `statistics` table-metadata entry; readers serve the ndv
  * from blob-metadata properties (foreign-publishable), fall back to
  * deserializing the sketch, and refuse un-analyzed tables loudly.
  * CBO visibility is proven on the plan's attribute statistics. */
class PuffinStatsSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def df(lo: Int, hi: Int) = {
    import spark.implicits._
    (lo to hi).map(i => (i.toLong, s"g${i % 7}", i / 2)).toDF("k", "grp", "half")
  }

  private def latestMeta(path: String): java.nio.file.Path = {
    val dir = Paths.get(path, "metadata")
    val vs = Files.list(dir).iterator()
    val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    while (vs.hasNext) { val p = vs.next(); if (p.toString.endsWith(".metadata.json")) buf += p }
    buf.maxBy(_.getFileName.toString)
  }

  test("analyze publishes theta blobs + the statistics entry; the reader round-trips") {
    val path = freshDir("puffin_stats_rt")
    Iceberg.write(df(1, 500), path)
    val ndv = Iceberg.analyzeTable(spark, path)
    // small cardinalities sit below the sketch's nominal entries — exact
    assert(ndv == Map("k" -> 500L, "grp" -> 7L, "half" -> 251L), ndv.toString)
    assert(Iceberg.readTableStatistics(spark, path) == ndv)
    // the metadata entry is spec-shaped and the puffin file parses
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val m = om.readTree(new String(Files.readAllBytes(latestMeta(path)), "UTF-8"))
    val entry = m.get("statistics").get(0)
    assert(entry.get("snapshot-id").asLong == Iceberg.snapshot(spark, path).snapshotId)
    val (blobs, _) = Puffin.readFooter(
      Writers.fsFor(path)._1,
      new org.apache.hadoop.fs.Path(entry.get("statistics-path").asText))
    assert(blobs.size == 3 &&
      blobs.forall(_.blobType == "apache-datasketches-theta-v1"))
    // re-analyze after an append serves the NEW snapshot's stats and
    // keeps the old snapshot's entry (one entry per analyzed snapshot)
    Iceberg.write(df(501, 600), path, mode = SaveMode.Append)
    val e = intercept[IllegalArgumentException](Iceberg.readTableStatistics(spark, path))
    assert(e.getMessage.contains("no statistics entry"), e.getMessage)
    val ndv2 = Iceberg.analyzeTable(spark, path)
    assert(ndv2("k") == 600L)
    val m2 = om.readTree(new String(Files.readAllBytes(latestMeta(path)), "UTF-8"))
    assert(m2.get("statistics").size == 2, "one statistics entry per analyzed snapshot")
  }

  test("ndv serves from blob-metadata properties alone (foreign stats); sketch is the fallback") {
    val path = freshDir("puffin_stats_foreign")
    Iceberg.write(df(1, 100), path)
    Iceberg.analyzeTable(spark, path)
    val metaPath = latestMeta(path)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val m = om.readTree(new String(Files.readAllBytes(metaPath), "UTF-8"))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val bm = m.get("statistics").get(0).get("blob-metadata")
    // (a) a FOREIGN engine's published ndv wins without opening any file
    val kBlob = (0 until bm.size()).map(bm.get)
      .find(_.get("properties").hasNonNull("ndv")).get
    kBlob.get("properties").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .put("ndv", "12345")
    // (b) a blob WITHOUT the property falls back to its theta sketch
    val other = (0 until bm.size()).map(bm.get).filterNot(_ eq kBlob).head
    other.get("properties").asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      .remove("ndv")
    Files.write(metaPath, om.writerWithDefaultPrettyPrinter()
      .writeValueAsString(m).getBytes("UTF-8"))
    Files.deleteIfExists(metaPath.resolveSibling("." + metaPath.getFileName + ".crc"))
    val got = Iceberg.readTableStatistics(spark, path)
    assert(got.values.toSeq.contains(12345L),
      s"the doctored (foreign) ndv must serve as published: $got")
    assert(got.size == 3, s"the property-less blob must decode from its sketch: $got")
  }

  test("partition statistics: spec-shaped parquet, per-spec rows on an evolved table") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = freshDir("puffin_pstats")
    def rows(lo: Int, hi: Int) = (lo to hi)
      .map(i => (i.toLong, java.time.LocalDateTime.of(2024, 1 + (i % 2), 1 + (i % 3), 0, 0)))
      .toDF("k", "ts")
    Iceberg.write(rows(1, 60), path, partitionBy = Seq("months(ts)"))
    Iceberg.replaceSpec(spark, path, Seq("days(ts)"))
    Iceberg.write(rows(61, 90), path, mode = SaveMode.Append)
    // un-registered reads refuse (never an empty frame)
    val e = intercept[IllegalArgumentException](
      Iceberg.readPartitionStatistics(spark, path))
    assert(e.getMessage.contains("writePartitionStats"), e.getMessage)
    val n = Iceberg.writePartitionStats(spark, path)
    val stats = Iceberg.readPartitionStatistics(spark, path)
    assert(stats.count() == n)
    // the spec's column names, and the union partition struct carries
    // BOTH specs' fields (old rows keyed by month, new by day)
    assert(stats.columns.toSet == Set("partition", "spec_id", "data_record_count",
      "data_file_count", "total_data_file_size_in_bytes"))
    val bySpec = stats.groupBy("spec_id")
      .agg(org.apache.spark.sql.functions.sum("data_record_count").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bySpec == Map(0 -> 60L, 1 -> 30L), bySpec.toString)
    assert(stats.filter(col("spec_id") === 0)
      .filter(col("partition.ts_month").isNotNull).count() ==
      stats.filter(col("spec_id") === 0).count(),
      "old-spec rows must key by their month field")
    assert(stats.filter(col("spec_id") === 1)
      .filter(col("partition.ts_day").isNotNull).count() ==
      stats.filter(col("spec_id") === 1).count(),
      "new-spec rows must key by their day field")
    // totals reconcile with the manifests
    val s = Iceberg.snapshot(spark, path)
    val total = stats.agg(org.apache.spark.sql.functions.sum("data_record_count"))
      .collect().head.getLong(0)
    assert(total == s.files.map(_.recordCount).sum)
    // the spec's TABLE-METADATA registration: the freshest metadata.json
    // carries a `partition-statistics` entry for the current snapshot
    // pointing at the written file — what a FOREIGN planner resolves
    val metaDir = java.nio.file.Paths.get(path, "metadata")
    import scala.jdk.CollectionConverters._
    val latest = java.nio.file.Files.list(metaDir).iterator().asScala
      .filter(_.toString.endsWith(".metadata.json"))
      .maxBy(_.getFileName.toString)
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new String(java.nio.file.Files.readAllBytes(latest), "UTF-8"))
    val entries = meta.get("partition-statistics")
    assert(entries != null && entries.isArray && entries.size() == 1,
      s"metadata must register exactly one partition-statistics entry: $entries")
    val entry = entries.get(0)
    assert(entry.get("snapshot-id").asLong == s.snapshotId)
    val statsPath = entry.get("statistics-path").asText
    assert(statsPath.contains("partition-stats-") &&
      java.nio.file.Files.exists(java.nio.file.Paths.get(statsPath)),
      s"statistics-path must name the written parquet: $statsPath")
    assert(entry.get("file-size-in-bytes").asLong ==
      java.nio.file.Files.size(java.nio.file.Paths.get(statsPath)))
  }

  test("merge-on-read debt serves NET row-count statistics over the fallback relation") {
    import org.apache.spark.sql.functions.col
    val path = freshDir("puffin_stats_mor")
    Iceberg.write(df(1, 200), path)
    Iceberg.upgradeToV3(spark, path)
    Iceberg.deleteMergeOnRead(spark, path, col("k") <= 50L)
    assert(Iceberg.snapshot(spark, path).dvDeletes.nonEmpty)
    // analyze the DEBTED snapshot (statistics entries pin a snapshot id)
    Iceberg.analyzeTable(spark, path)
    val prev = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val frame = Iceberg.readWithStats(spark, path)
      val st = frame.queryExecution.optimizedPlan.stats
      assert(st.rowCount.contains(BigInt(150)),
        s"DV debt must serve the net live-row count, not the pre-delete total: $st")
      val seen = st.attributeStats.collectFirst {
        case (a, cs) if a.name == "k" => cs.distinctCount
      }.flatten
      assert(seen.nonEmpty, s"the published ndv must still reach MoR planning: $st")
      // and the frame itself applies the deletes (fallback relation)
      assert(frame.count() == 150L)
      assert(frame.filter(col("k") <= 50L).count() == 0L)
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }

  test("an un-analyzed table refuses loudly; CBO sees the ndv on the plan") {
    val path = freshDir("puffin_stats_cbo")
    Iceberg.write(df(1, 300), path)
    val e = intercept[IllegalArgumentException](Iceberg.readTableStatistics(spark, path))
    assert(e.getMessage.contains("analyzeTable"), e.getMessage)
    val ndv = Iceberg.analyzeTable(spark, path)
    val prev = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val frame = Iceberg.readWithStats(spark, path)
      val st = frame.queryExecution.optimizedPlan.stats
      assert(st.rowCount.contains(BigInt(300)), s"row count must reach planning: $st")
      val seen = st.attributeStats.collectFirst {
        case (a, cs) if a.name == "k" => cs.distinctCount
      }.flatten
      assert(seen.contains(BigInt(ndv("k"))),
        s"the published ndv must reach the planner's attribute stats: $seen vs $ndv")
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }
}
