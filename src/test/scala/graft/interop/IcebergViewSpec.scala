package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg VIEW SPEC (view metadata v1) through [[GraftCatalog]]'s
  * ViewCatalog surface: the full SQL lifecycle (CREATE / SELECT /
  * CREATE OR REPLACE / SHOW / ALTER properties / RENAME / DROP), the
  * spec's versioned-metadata contract (REPLACE appends a view-version
  * under one view-uuid — time-travel-stable), default-namespace
  * late-binding resolution, and the honest gates (duplicate create,
  * self-reference, table/view name collisions). */
class IcebergViewSpec extends AnyFunSuite with SparkFixture {

  private def wipe(ns: String): Unit = {
    Writers.deleteTree(Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_test", "warehouse", ns))
    (): Unit
  }

  private def viewDir(ns: String, name: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_test", "warehouse", ns, name).toString

  private def setup(ns: String): Unit = {
    wipe(ns)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft.$ns")
    spark.sql(s"CREATE TABLE graft.$ns.t (k BIGINT, grp STRING, v BIGINT) USING iceberg")
    spark.sql(s"INSERT INTO graft.$ns.t VALUES (1,'a',10),(2,'b',20),(3,'a',30),(4,'b',40)")
    (): Unit
  }

  test("lifecycle: create, select, replace bumps version, old SQL time-travel-stable") {
    setup("vdb1")
    spark.sql("CREATE VIEW graft.vdb1.w AS SELECT k, v FROM graft.vdb1.t WHERE grp = 'a'")
    assert(spark.sql("SELECT k, v FROM graft.vdb1.w ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 10L), (3L, 30L)))
    val m1 = IcebergView.load(viewDir("vdb1", "w"))
    assert(m1.currentVersionId == 1 && m1.versions.size == 1)
    assert(m1.current.sql.contains("grp = 'a'"))
    assert(m1.current.defaultCatalog.contains("spark_catalog") ||
      m1.current.defaultCatalog.contains("graft"))
    // REPLACE: new SQL, appended version, same uuid, v1 SQL intact
    spark.sql("CREATE OR REPLACE VIEW graft.vdb1.w AS " +
      "SELECT grp, sum(v) AS sv FROM graft.vdb1.t GROUP BY grp")
    val m2 = IcebergView.load(viewDir("vdb1", "w"))
    assert(m2.uuid == m1.uuid, "REPLACE must keep the view-uuid")
    assert(m2.currentVersionId == 2 && m2.versions.size == 2)
    assert(m2.versions.find(_.versionId == 1).exists(_.sql == m1.current.sql),
      "version 1's SQL must survive the replace verbatim")
    assert(spark.sql("SELECT grp, sv FROM graft.vdb1.w ORDER BY grp").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 40L), ("b", 60L)))
    // LATE BINDING: new table rows flow through without touching the view
    spark.sql("INSERT INTO graft.vdb1.t VALUES (5,'a',5)")
    assert(spark.sql("SELECT sv FROM graft.vdb1.w WHERE grp = 'a'").head().getLong(0) == 45L)
  }

  test("default-namespace resolution: unqualified names bind to the definer's namespace") {
    setup("vdb2")
    // through the API with an unqualified inner name — the stored
    // default-catalog/namespace must qualify it at read
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.ViewCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("vdb2"), "uq")
    cat.createView(new org.apache.spark.sql.connector.catalog.ViewInfo(
      ident, "SELECT k FROM t WHERE v > 15", "graft", Array("vdb2"),
      new org.apache.spark.sql.types.StructType().add("k", "bigint"),
      Array.empty, Array.empty, Array.empty, new java.util.HashMap[String, String]()))
    assert(spark.sql("SELECT k FROM graft.vdb2.uq ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
  }

  test("column alias list folds into the stored SQL; schema renames") {
    setup("vdb3")
    spark.sql("CREATE VIEW graft.vdb3.al (key, total) AS " +
      "SELECT k, v FROM graft.vdb3.t WHERE grp = 'b'")
    assert(spark.sql("SELECT key, total FROM graft.vdb3.al ORDER BY key").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 20L), (4L, 40L)))
    val m = IcebergView.load(viewDir("vdb3", "al"))
    assert(m.schema.fieldNames.toSeq == Seq("key", "total"))
  }

  test("SHOW VIEWS lists views, SHOW TABLES does not; tables and views collide") {
    setup("vdb4")
    spark.sql("CREATE VIEW graft.vdb4.sv AS SELECT k FROM graft.vdb4.t")
    val views = spark.sql("SHOW VIEWS IN graft.vdb4").collect().map(_.getString(1)).toSeq
    assert(views == Seq("sv"))
    val tables = spark.sql("SHOW TABLES IN graft.vdb4").collect().map(_.getString(1)).toSeq
    assert(tables.contains("t") && !tables.contains("sv"),
      s"views must not list as tables, got $tables")
    // duplicate create refuses; IF NOT EXISTS tolerates
    intercept[Exception](
      spark.sql("CREATE VIEW graft.vdb4.sv AS SELECT k FROM graft.vdb4.t"))
    spark.sql("CREATE VIEW IF NOT EXISTS graft.vdb4.sv AS SELECT v FROM graft.vdb4.t")
    assert(IcebergView.load(viewDir("vdb4", "sv")).currentVersionId == 1,
      "IF NOT EXISTS over an existing view must be a no-op")
    // a view name cannot shadow a table
    intercept[Exception](
      spark.sql("CREATE VIEW graft.vdb4.t AS SELECT k FROM graft.vdb4.t"))
    // ... and a TABLE cannot land on a view's directory (create or CTAS
    // would corrupt the view metadata)
    intercept[Exception](
      spark.sql("CREATE TABLE graft.vdb4.sv (x BIGINT) USING iceberg"))
    intercept[Exception](
      spark.sql("CREATE TABLE graft.vdb4.sv USING delta AS SELECT 1L AS x"))
    // DROP TABLE does not drop views
    intercept[Exception](spark.sql("DROP TABLE graft.vdb4.sv"))
    assert(spark.sql("SHOW VIEWS IN graft.vdb4").collect().map(_.getString(1)).toSeq
      == Seq("sv"))
  }

  test("ALTER VIEW SET/UNSET TBLPROPERTIES; RENAME; DROP") {
    setup("vdb5")
    spark.sql("CREATE VIEW graft.vdb5.p AS SELECT k FROM graft.vdb5.t")
    spark.sql("ALTER VIEW graft.vdb5.p SET TBLPROPERTIES ('team'='etl', 'tier'='gold')")
    assert(IcebergView.load(viewDir("vdb5", "p")).properties ==
      Map("team" -> "etl", "tier" -> "gold"))
    spark.sql("ALTER VIEW graft.vdb5.p UNSET TBLPROPERTIES ('tier')")
    assert(IcebergView.load(viewDir("vdb5", "p")).properties == Map("team" -> "etl"))
    spark.sql("ALTER VIEW graft.vdb5.p RENAME TO graft.vdb5.q")
    assert(spark.sql("SELECT count(*) FROM graft.vdb5.q").head().getLong(0) == 4L)
    spark.sql("DROP VIEW graft.vdb5.q")
    assert(spark.sql("SHOW VIEWS IN graft.vdb5").collect().isEmpty)
    intercept[Exception](spark.sql("DROP VIEW graft.vdb5.q"))
    spark.sql("DROP VIEW IF EXISTS graft.vdb5.q") // tolerated
  }

  test("self-referencing view refuses at read") {
    setup("vdb6")
    spark.sql("CREATE VIEW graft.vdb6.s AS SELECT k FROM graft.vdb6.t")
    // replace it with a self-reference: creation analyzes the OLD
    // binding, the refusal lands at read
    spark.sql("CREATE OR REPLACE VIEW graft.vdb6.s AS SELECT k FROM graft.vdb6.s")
    val e = intercept[Exception](spark.sql("SELECT * FROM graft.vdb6.s").collect())
    assert(e.getMessage.contains("references itself"))
  }

  test("DESCRIBE and DESCRIBE EXTENDED serve the view's schema and metadata") {
    setup("vdb8")
    spark.sql("CREATE VIEW graft.vdb8.dv AS SELECT k, grp FROM graft.vdb8.t")
    val plain = spark.sql("DESCRIBE graft.vdb8.dv").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(plain == Seq(("k", "bigint"), ("grp", "string")))
    val ext = spark.sql("DESCRIBE EXTENDED graft.vdb8.dv").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(ext("Type") == "VIEW")
    assert(ext("View Text").contains("SELECT k, grp"))
    // default-namespace records the DEFINER's current namespace (what
    // unqualified inner names resolve against), not the view's own
    assert(ext.contains("View Namespace") && ext.contains("View Catalog"))
  }

  test("ALTER VIEW AS replaces the SQL keeping properties; INSERT INTO a view refuses") {
    setup("vdb9")
    spark.sql("CREATE VIEW graft.vdb9.av AS SELECT k FROM graft.vdb9.t")
    spark.sql("ALTER VIEW graft.vdb9.av SET TBLPROPERTIES ('team'='etl')")
    spark.sql("ALTER VIEW graft.vdb9.av AS SELECT k, v FROM graft.vdb9.t WHERE grp = 'b'")
    val m = IcebergView.load(viewDir("vdb9", "av"))
    assert(m.currentVersionId == 2 && m.properties == Map("team" -> "etl"),
      s"ALTER AS must bump the version and keep properties, got v${m.currentVersionId} ${m.properties}")
    assert(spark.sql("SELECT k, v FROM graft.vdb9.av ORDER BY k").collect()
      .map(_.getLong(0)).toSeq == Seq(2L, 4L))
    val e = intercept[Exception](
      spark.sql("INSERT INTO graft.vdb9.av VALUES (9, 90)"))
    assert(e.getMessage.contains("is a VIEW"), s"got: ${e.getMessage}")
  }

  test("USE graft: namespace-qualified and bare view names resolve under the current catalog") {
    setup("vdb10")
    spark.sql("CREATE VIEW graft.vdb10.uv AS SELECT k FROM graft.vdb10.t WHERE v > 25")
    val cm = spark.sessionState.catalogManager
    val (prevCat, prevNs) = (cm.currentCatalog.name, cm.currentNamespace)
    try {
      spark.sql("USE graft.vdb10")
      assert(spark.sql("SELECT k FROM vdb10.uv ORDER BY k").collect()
        .map(_.getLong(0)).toSeq == Seq(3L, 4L), "2-part name under current graft catalog")
      assert(spark.sql("SELECT k FROM uv ORDER BY k").collect()
        .map(_.getLong(0)).toSeq == Seq(3L, 4L), "bare name under current namespace")
    } finally {
      spark.sql(s"USE ${(prevCat +: prevNs.toSeq).mkString(".")}")
      (): Unit
    }
  }

  test("SHOW CREATE TABLE over a view renders the CREATE VIEW statement") {
    setup("vdb11")
    spark.sql("CREATE VIEW graft.vdb11.sc AS SELECT k, v FROM graft.vdb11.t")
    spark.sql("ALTER VIEW graft.vdb11.sc SET TBLPROPERTIES ('team'='etl')")
    val ddl = spark.sql("SHOW CREATE TABLE graft.vdb11.sc").head().getString(0)
    assert(ddl.startsWith("CREATE VIEW graft.vdb11.sc (`k`, `v`)"), ddl)
    assert(ddl.contains("'team' = 'etl'") && ddl.contains("AS SELECT k, v"), ddl)
  }

  test("views compose: a view over a view resolves through both") {
    setup("vdb7")
    spark.sql("CREATE VIEW graft.vdb7.base AS SELECT k, v FROM graft.vdb7.t WHERE v >= 20")
    spark.sql("CREATE VIEW graft.vdb7.top AS SELECT sum(v) AS s FROM graft.vdb7.base")
    assert(spark.sql("SELECT s FROM graft.vdb7.top").head().getLong(0) == 90L)
  }
}
