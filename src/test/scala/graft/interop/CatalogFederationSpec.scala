package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.scalatest.funsuite.AnyFunSuite

/** CATALOG FEDERATION (r16 verdict "missing #2") — a real deployment
  * attaches MULTIPLE catalogs (Hive Metastore, REST, a second
  * warehouse); Spark's `TableCatalog` plug-in point IS the federation
  * interface, and this spec proves the engine is a clean citizen of
  * it: nothing in the rules, write commands, procedures, or time
  * travel is bound to the one session catalog instance named `graft`.
  *
  * Proven by registering a SECOND [[org.apache.spark.sql.graft
  * .GraftCatalog]] instance (`fed2`) over its own warehouse at
  * runtime — catalogs instantiate lazily from conf, exactly how an
  * HMS/REST catalog would attach — and driving: independent name
  * resolution, cross-catalog joins and INSERT … SELECT in one query,
  * `USE` current-catalog switching, per-instance stored procedures,
  * and per-instance time travel. The extension rules dispatch on the
  * catalog/table TYPE (`GraftTable`), never the name, which is the
  * property that makes a foreign `TableCatalog` (HMS-backed) attach
  * without touching this engine's code. The one name-bound surface is
  * the `table_changes` TVF (documented: it resolves through the
  * catalog named `graft`). */
class CatalogFederationSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private lazy val fed2Ready: Unit = {
    spark.conf.set("spark.sql.catalog.fed2", "org.apache.spark.sql.graft.GraftCatalog")
    spark.conf.set("spark.sql.catalog.fed2.warehouse", freshDir("fed2_warehouse"))
  }

  private def reset(): Unit = {
    fed2Ready
    // the session is JVM-shared: every statement here is fully
    // qualified, and any USE below must restore spark_catalog or later
    // suites' unqualified session-catalog DDL would resolve into graft
    spark.sql("USE spark_catalog")
    Seq("graft", "fed2").foreach(c =>
      spark.sql(s"DROP NAMESPACE IF EXISTS $c.fedns CASCADE"))
    Seq("graft", "fed2").foreach(c => spark.sql(s"CREATE NAMESPACE $c.fedns"))
  }

  test("two catalog instances hold disjoint warehouses; identical names resolve independently") {
    reset()
    spark.sql("CREATE TABLE graft.fedns.t (k BIGINT, v STRING) USING graft")
    spark.sql("CREATE TABLE fed2.fedns.t (k BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO graft.fedns.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO fed2.fedns.t VALUES (10, 'x')")
    assert(spark.sql("SELECT count(*) FROM graft.fedns.t").head().getLong(0) == 2L)
    assert(spark.sql("SELECT count(*) FROM fed2.fedns.t").head().getLong(0) == 1L)
    // SHOW TABLES is instance-scoped
    assert(spark.sql("SHOW TABLES IN fed2.fedns").collect().map(_.getString(1)).toSet == Set("t"))
    // dropping one instance's namespace leaves the other intact
    spark.sql("DROP NAMESPACE graft.fedns CASCADE")
    assert(spark.sql("SELECT count(*) FROM fed2.fedns.t").head().getLong(0) == 1L)
  }

  test("cross-catalog joins and INSERT ... SELECT move data between instances in one query") {
    reset()
    spark.sql("CREATE TABLE graft.fedns.src (k BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO graft.fedns.src VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("CREATE TABLE fed2.fedns.dim (k BIGINT, tag STRING) USING graft")
    spark.sql("INSERT INTO fed2.fedns.dim VALUES (1, 'keep'), (3, 'keep')")
    // one query spanning both catalog instances
    val joined = spark.sql("""
      SELECT s.k, s.v, d.tag
      FROM graft.fedns.src s JOIN fed2.fedns.dim d ON s.k = d.k
      ORDER BY s.k""").collect()
    assert(joined.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // cross-catalog INSERT ... SELECT (write into fed2 FROM graft)
    spark.sql("CREATE TABLE fed2.fedns.copy (k BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO fed2.fedns.copy SELECT k, v FROM graft.fedns.src WHERE k <> 2")
    assert(spark.sql("SELECT count(*) FROM fed2.fedns.copy").head().getLong(0) == 2L)
  }

  test("USE switches the current catalog; unqualified names bind to it") {
    reset()
    spark.sql("CREATE TABLE fed2.fedns.cur (k BIGINT) USING graft")
    spark.sql("INSERT INTO fed2.fedns.cur VALUES (7)")
    try {
      spark.sql("USE fed2.fedns")
      assert(spark.sql("SELECT k FROM cur").head().getLong(0) == 7L,
        "an unqualified name must bind to the current catalog+namespace")
    } finally spark.sql("USE spark_catalog")
  }

  test("stored procedures and time travel dispatch against the owning instance") {
    reset()
    spark.sql("CREATE TABLE fed2.fedns.tt (k BIGINT) USING graft")
    spark.sql("INSERT INTO fed2.fedns.tt VALUES (1)")
    spark.sql("INSERT INTO fed2.fedns.tt VALUES (2)")
    // time travel through the second instance's name: the version
    // BEFORE the second insert (resolved from the fed2 warehouse's own
    // commit log, not assumed) must serve one row
    val tablePath = Paths.get(
      spark.conf.get("spark.sql.catalog.fed2.warehouse"), "fedns", "tt").toString
    val preSecond = graft.ingest.Versioned.versions(tablePath).takeRight(2).head
    assert(spark.sql(s"SELECT count(*) FROM fed2.fedns.tt VERSION AS OF $preSecond")
      .head().getLong(0) == 1L)
    assert(spark.sql("SELECT count(*) FROM fed2.fedns.tt").head().getLong(0) == 2L)
    // CALL against the second instance: the procedure resolves through
    // fed2's ProcedureCatalog and compacts fed2's table
    spark.sql("CALL fed2.system.compact('fedns.tt')").collect()
    assert(spark.sql("SELECT count(*) FROM fed2.fedns.tt").head().getLong(0) == 2L,
      "compaction through the second instance must preserve content")
  }
}
