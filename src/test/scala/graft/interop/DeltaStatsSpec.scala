package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** Delta planner statistics (r12 verdict next #6 — foreign-stats
  * symmetry): ANALYZE sketches every primitive column in one
  * distributed theta pass and publishes `{asOfVersion, rowCount, ndv}`
  * as the `graft.statistics` domainMetadata action (the protocol's
  * sanctioned keyed channel — no statistics-file layer exists in
  * Delta, unlike Iceberg's Puffin). readWithStats serves the table
  * with CatalogStatistics attached, so CBO costs it like an ANALYZEd
  * catalog table — the same contract PuffinStatsSpec locks for
  * Iceberg. */
class DeltaStatsSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  test("analyzeTable publishes the graft.statistics domain; re-analyze replaces it") {
    import spark.implicits._
    val path = freshDir("dstats")
    DeltaLake.write((1 to 100).map(i => (i.toLong, s"g${i % 7}", i % 2 == 0))
      .toDF("k", "grp", "flag"), path)
    val ndv = DeltaLake.analyzeTable(spark, path)
    assert(ndv == Map("k" -> 100L, "grp" -> 7L, "flag" -> 2L), ndv.toString)
    assert(DeltaLake.readTableStatistics(spark, path) == ndv,
      "the published statistics must read back exactly")
    // the artifact rides domainMetadata: a foreign reader sees a
    // domain action it can ignore; our replay folds the latest
    val snap = DeltaLake.snapshot(spark, path)
    assert(snap.domains.contains("graft.statistics"))
    assert(snap.protocol.minWriter < 7 ||
      snap.protocol.writerFeatures.contains("domainMetadata"))
    // stale stats replace on re-analyze (latest-domain-wins replay)
    DeltaLake.write(Seq((200L, "g_new", true)).toDF("k", "grp", "flag"), path,
      mode = SaveMode.Append)
    val ndv2 = DeltaLake.analyzeTable(spark, path)
    assert(ndv2 == Map("k" -> 101L, "grp" -> 8L, "flag" -> 2L), ndv2.toString)
    assert(DeltaLake.readTableStatistics(spark, path) == ndv2)
  }

  test("readWithStats: CBO sees row count and published ndv at planning") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val path = freshDir("dstats_cbo")
    DeltaLake.write((1 to 50).map(i => (i.toLong, s"s${i % 5}")).toDF("k", "seg"), path)
    DeltaLake.analyzeTable(spark, path)
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val st = DeltaLake.readWithStats(spark, path).queryExecution.optimizedPlan.stats
      assert(st.rowCount.contains(BigInt(50)),
        s"planning must see the adds' recorded row count: $st")
      val seenK = st.attributeStats.collectFirst {
        case (a, cs) if a.name == "k" => cs.distinctCount
      }.flatten
      assert(seenK.contains(BigInt(50)), s"planning must see the published ndv: $seenK")
      val seenSeg = st.attributeStats.collectFirst {
        case (a, cs) if a.name == "seg" => cs.distinctCount
      }.flatten
      assert(seenSeg.contains(BigInt(5)), s"planning must see the published ndv: $seenSeg")
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
    // the stats-served frame answers queries identically to the plain read
    assert(DeltaLake.readWithStats(spark, path).filter(col("seg") === "s3").count() ==
      DeltaLake.read(spark, path).filter(col("seg") === "s3").count())
    // outstanding deletion vectors serve the NET row count over the
    // fallback relation (DV cardinality is exact per the protocol) —
    // delete debt must never degrade planning to stats-less or serve
    // the stale pre-delete total
    DeltaLake.deleteMergeOnRead(spark, path, col("k") <= 10L)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val st2 = DeltaLake.readWithStats(spark, path).queryExecution.optimizedPlan.stats
      assert(st2.rowCount.contains(BigInt(40)),
        s"a DV-bearing table must serve the net live-row count: $st2")
      val seenK2 = st2.attributeStats.collectFirst {
        case (a, cs) if a.name == "k" => cs.distinctCount
      }.flatten
      assert(seenK2.contains(BigInt(50)),
        s"the published ndv must still reach MoR planning: $seenK2")
    } finally spark.conf.set("spark.sql.cbo.enabled", prevCbo)
    assert(DeltaLake.readWithStats(spark, path).count() == 40L)
  }

  test("never-analyzed and empty tables behave: no ndv, honest row counts") {
    import spark.implicits._
    val path = freshDir("dstats_plain")
    DeltaLake.write(Seq((1L, "a")).toDF("k", "v"), path)
    assert(DeltaLake.readTableStatistics(spark, path).isEmpty)
    // row count still serves from the adds' stats, ndv absent
    val st = DeltaLake.readWithStats(spark, path).queryExecution.optimizedPlan.stats
    assert(st.attributeStats.isEmpty)
    val empty = freshDir("dstats_empty")
    DeltaLake.write(Seq.empty[(Long, String)].toDF("k", "v"), empty)
    assert(DeltaLake.analyzeTable(spark, empty) == Map("k" -> 0L, "v" -> 0L))
  }
}
