package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

/** The remaining SQL DDL surface through the catalog (r13): CREATE
  * TABLE with `GENERATED ALWAYS AS (expr)` (Delta's generatedColumns
  * writer feature — the analyzer delivers the expression on the
  * v2-Column create path, which the catalog re-encodes), and
  * `ALTER TABLE ADD/DROP CONSTRAINT ... CHECK` (Delta's
  * checkConstraints feature: validate-at-add, enforce-on-write).
  * Formats whose specs lack the concept refuse loudly, pre-create. */
class SqlDdlSurfaceSpec extends AnyFunSuite with SparkFixture {

  private def wh(db: String) =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", "warehouse", db)

  test("CREATE TABLE ... GENERATED ALWAYS AS (expr): computed on omit, validated on carry") {
    import spark.implicits._
    val whd = wh("dbgen"); Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbgen")
    spark.sql("""CREATE TABLE graft.dbgen.td (
      k BIGINT, v STRING,
      k2 BIGINT GENERATED ALWAYS AS (k * 2)) USING delta""")
    val dp = whd.resolve("td").toString
    val snap = DeltaLake.snapshot(spark, dp)
    assert(snap.rawSchema("k2").metadata.getString("delta.generationExpression") == "k * 2")
    // an append omitting the column COMPUTES it
    DeltaLake.write(Seq((3L, "a"), (4L, "b")).toDF("k", "v"), dp, mode = SaveMode.Append)
    assert(spark.table("graft.dbgen.td").select("k2").as[Long].collect().sorted.toSeq
      == Seq(6L, 8L))
    // a carried WRONG value refuses (the generated-column validation)
    val e = intercept[Exception](DeltaLake.write(
      Seq((5L, "c", 99L)).toDF("k", "v", "k2"), dp, mode = SaveMode.Append))
    assert(e.getMessage.contains("GENERATED"), e.getMessage)
    // non-delta formats refuse BEFORE anything lands
    val ei = intercept[Exception](spark.sql(
      "CREATE TABLE graft.dbgen.ti (k BIGINT, k2 BIGINT GENERATED ALWAYS AS (k * 2)) USING iceberg"))
    assert(ei.getMessage.contains("generatedColumns"), ei.getMessage)
    val eg = intercept[Exception](spark.sql(
      "CREATE TABLE graft.dbgen.tg (k BIGINT, k2 BIGINT GENERATED ALWAYS AS (k * 2)) USING graft"))
    assert(eg.getMessage.contains("generatedColumns"), eg.getMessage)
    assert(intercept[Exception](spark.table("graft.dbgen.ti").count()) != null,
      "the refused create must leave no table behind")
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT CHECK: validate at add, enforce on write") {
    import spark.implicits._
    val whd = wh("dbcon"); Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbcon")
    spark.sql("CREATE TABLE graft.dbcon.td (k BIGINT, v STRING) USING delta")
    val dp = whd.resolve("td").toString
    DeltaLake.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dp, mode = SaveMode.Append)
    spark.sql("ALTER TABLE graft.dbcon.td ADD CONSTRAINT k_pos CHECK (k > 0)")
    assert(DeltaLake.snapshot(spark, dp).configuration
      .get("delta.constraints.k_pos").exists(_.contains("k > 0")))
    // served back through the DSv2 constraint surface
    val served = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("dbcon"), "td")).constraints()
    assert(served.length == 1 && served.head.name() == "k_pos")
    // enforced on every subsequent write
    val e = intercept[Exception](DeltaLake.write(
      Seq((-5L, "bad")).toDF("k", "v"), dp, mode = SaveMode.Append))
    assert(e.getMessage.contains("k_pos"), e.getMessage)
    // adding a constraint the data already violates refuses
    val e2 = intercept[Exception](spark.sql(
      "ALTER TABLE graft.dbcon.td ADD CONSTRAINT k_big CHECK (k > 100)"))
    assert(e2.getMessage.contains("violate"), e2.getMessage)
    // drop: enforcement stops; unknown names refuse without IF EXISTS
    spark.sql("ALTER TABLE graft.dbcon.td DROP CONSTRAINT k_pos")
    DeltaLake.write(Seq((-5L, "now ok")).toDF("k", "v"), dp, mode = SaveMode.Append)
    assert(spark.table("graft.dbcon.td").count() == 3L)
    val e3 = intercept[Exception](spark.sql(
      "ALTER TABLE graft.dbcon.td DROP CONSTRAINT nope"))
    assert(e3.getMessage.contains("nope"), e3.getMessage)
    spark.sql("ALTER TABLE graft.dbcon.td DROP CONSTRAINT IF EXISTS nope") // tolerated
    // non-delta formats refuse; so do informational constraint kinds
    spark.sql("CREATE TABLE graft.dbcon.ti (k BIGINT) USING iceberg")
    val e4 = intercept[Exception](spark.sql(
      "ALTER TABLE graft.dbcon.ti ADD CONSTRAINT c CHECK (k > 0)"))
    assert(e4.getMessage.contains("no constraint layer"), e4.getMessage)
    val e5 = intercept[Exception](spark.sql(
      "ALTER TABLE graft.dbcon.td ADD CONSTRAINT u UNIQUE (k)"))
    assert(e5.getMessage.toLowerCase.contains("unique") ||
      e5.getMessage.contains("enforceable"), e5.getMessage)
  }

  test("table_history TVF: one metadata row per commit, all three formats") {
    import spark.implicits._
    val whd = wh("dbhist"); Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbhist")
    def rows(n: Int) = (1 to n).map(i => (i.toLong, s"r$i")).toDF("k", "v")
    val dp = whd.resolve("td").toString
    DeltaLake.write(rows(2), dp)
    DeltaLake.write(rows(1), dp, mode = SaveMode.Append)
    val dh = spark.sql(
      "SELECT * FROM table_history('dbhist.td') ORDER BY version").collect()
    assert(dh.length == 2, s"two delta commits, got ${dh.length}")
    val ip = whd.resolve("ti").toString
    Iceberg.write(rows(2), ip)
    Iceberg.write(rows(1), ip, mode = SaveMode.Append)
    assert(spark.sql("SELECT count(*) FROM table_history('graft.dbhist.ti')")
      .head().getLong(0) == 2L, "two iceberg snapshots")
    val gp = whd.resolve("tg").toString
    graft.ingest.Versioned.commit(rows(2), gp)
    graft.ingest.Versioned.appendCommit(rows(1), gp)
    assert(spark.sql("SELECT count(*) FROM table_history('dbhist.tg')")
      .head().getLong(0) == 2L, "two graft versions")
    val e = intercept[Exception](
      spark.sql("SELECT * FROM table_history('nope')").collect())
    assert(e.getMessage.contains("namespace.table"), e.getMessage)
  }
}
