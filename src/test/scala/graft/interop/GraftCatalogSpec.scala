package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end SQL over the V2 [[org.apache.spark.sql.graft.GraftCatalog]]:
  * CREATE / INSERT / SELECT with time-travel syntax / DML / ALTER /
  * SHOW / DESCRIBE / CTAS / DROP, for all three formats. The catalog is
  * registered by SparkFixture (`spark.sql.catalog.graft` +
  * `.warehouse`), exactly the two conf lines a deployment adds. */
class GraftCatalogSpec extends AnyFunSuite with SparkFixture {

  private def wipe(ns: String): Unit = {
    Writers.deleteTree(Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_test", "warehouse", ns))
    (): Unit
  }

  private def rows(sql: String): Seq[Seq[Any]] =
    spark.sql(sql).collect().toSeq.map(_.toSeq)

  test("metadata tables: ns.tbl.files / .history / .snapshots resolve per format, read-only") {
    wipe("dbmt")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbmt")
    spark.sql("CREATE TABLE graft.dbmt.ti (k BIGINT, v STRING) USING iceberg")
    spark.sql("INSERT INTO graft.dbmt.ti VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.dbmt.ti VALUES (3, 'c')")
    // iceberg's full inspection suffix family
    assert(spark.sql("SELECT count(*) FROM graft.dbmt.ti.files").head().getLong(0) >= 2L)
    assert(spark.sql("SELECT count(*) FROM graft.dbmt.ti.snapshots").head().getLong(0) == 3L)
    assert(spark.sql("SELECT count(*) FROM graft.dbmt.ti.manifests").head().getLong(0) >= 1L)
    assert(spark.sql("SELECT count(*) FROM graft.dbmt.ti.history").head().getLong(0) == 3L)
    assert(spark.table("graft.dbmt.ti.refs").columns.contains("snapshot_id"))
    // delta + graft get their subsets
    spark.sql("CREATE TABLE graft.dbmt.td (k BIGINT) USING delta")
    spark.sql("INSERT INTO graft.dbmt.td VALUES (1)")
    assert(spark.sql("SELECT count(*) FROM graft.dbmt.td.history").head().getLong(0) >= 2L)
    assert(spark.sql("SELECT count(*) FROM graft.dbmt.td.files").head().getLong(0) >= 1L)
    spark.sql("CREATE TABLE graft.dbmt.tg (k BIGINT) USING graft")
    spark.sql("INSERT INTO graft.dbmt.tg VALUES (1)")
    assert(spark.sql("SELECT count(*) FROM graft.dbmt.tg.history").head().getLong(0) >= 1L)
    // unknown suffixes stay NOT FOUND; metadata tables refuse writes
    intercept[Exception](spark.sql("SELECT * FROM graft.dbmt.ti.nonsense").collect())
    val e = intercept[Exception](
      spark.sql("INSERT INTO graft.dbmt.ti.files VALUES ('x', 1)"))
    assert(e.getMessage.toLowerCase.contains("read-only")
      || e.getMessage.toLowerCase.contains("too many data columns")
      || e.getMessage.toLowerCase.contains("not enough data columns"),
      s"metadata table must not accept inserts: ${e.getMessage}")
  }

  test("MoR fallback reads prune: pushed filters reach the inner FileIndex and columns prune") {
    wipe("dbmor")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbmor")
    val path = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_test", "warehouse", "dbmor", "t").toString
    import spark.implicits._
    // a partitioned iceberg table, 4 partitions, then MoR delete debt
    graft.interop.Iceberg.write(
      (1L to 4000L).map(k => (k, s"r$k", (k % 4).toString)).toDF("k", "v", "p"),
      path, partitionBy = Seq("p"))
    graft.interop.Iceberg.deleteMergeOnRead(spark, path,
      org.apache.spark.sql.functions.col("k") % 100 === 0)
    // the catalog read now serves through the MoR fallback relation
    val n = spark.sql("SELECT count(*) FROM graft.dbmor.t WHERE p = '2'").head().getLong(0)
    assert(n == 1000L - (1L to 4000L).count(k => k % 4 == 2 && k % 100 == 0))
    // the pushed partition filter must have pruned files in the INNER
    // pruning FileIndex (the library read the fallback scans through)
    val (kept, total) = org.apache.spark.sql.graft.VersionedFileIndex.lastPlanned(path).get
    assert(kept < total,
      s"MoR fallback must push the partition filter into the inner FileIndex ($kept/$total)")
  }

  test("graft format: create, insert, time travel, DML, alter, drop") {
    wipe("db1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db1")
    spark.sql("CREATE TABLE graft.db1.t (k BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO graft.db1.t VALUES (1, 'a'), (2, 'b')") // graft v2
    spark.sql("INSERT INTO graft.db1.t VALUES (3, 'c')")           // graft v3
    assert(rows("SELECT k, v FROM graft.db1.t ORDER BY k") ==
      Seq(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
    // SQL time travel: VERSION AS OF pins the commit
    assert(rows("SELECT count(*) AS n FROM graft.db1.t VERSION AS OF 2") == Seq(Seq(2L)))
    assert(rows("SELECT count(*) AS n FROM graft.db1.t VERSION AS OF 3") == Seq(Seq(3L)))
    // DML through the same SQL surface as path tables
    spark.sql("UPDATE graft.db1.t SET v = 'B' WHERE k = 2")
    spark.sql("DELETE FROM graft.db1.t WHERE k = 1")
    assert(rows("SELECT k, v FROM graft.db1.t ORDER BY k") ==
      Seq(Seq(2L, "B"), Seq(3L, "c")))
    // MERGE
    spark.sql("""MERGE INTO graft.db1.t t USING (SELECT 3L AS k, 'C' AS v
                 UNION ALL SELECT 9L, 'z') s
                 ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(rows("SELECT k, v FROM graft.db1.t ORDER BY k") ==
      Seq(Seq(2L, "B"), Seq(3L, "C"), Seq(9L, "z")))
    // ALTER through the V2 catalog path
    spark.sql("ALTER TABLE graft.db1.t ADD COLUMN score DOUBLE")
    assert(rows("SELECT k, score FROM graft.db1.t WHERE k = 2") == Seq(Seq(2L, null)))
    spark.sql("ALTER TABLE graft.db1.t RENAME COLUMN v TO label")
    assert(spark.table("graft.db1.t").columns.toSeq == Seq("k", "label", "score"))
    spark.sql("ALTER TABLE graft.db1.t DROP COLUMN score")
    assert(spark.table("graft.db1.t").columns.toSeq == Seq("k", "label"))
    // SHOW / DESCRIBE
    assert(rows("SHOW TABLES IN graft.db1").map(_(1)) == Seq("t"))
    val desc = rows("DESCRIBE EXTENDED graft.db1.t").map(_.map(String.valueOf))
    assert(desc.exists(r => r.head == "k" && r(1) == "bigint"))
    assert(desc.exists(r => r.contains("graft")), s"provider row missing in $desc")
    // SHOW CREATE TABLE renders a replayable definition off the V2 surface
    val ddl = rows("SHOW CREATE TABLE graft.db1.t").head.head.toString
    assert(ddl.contains("CREATE TABLE graft.db1.t") && ddl.contains("USING graft"),
      s"unexpected DDL: $ddl")
    assert(ddl.contains("k BIGINT") && ddl.contains("label STRING"), s"unexpected DDL: $ddl")
    // DROP
    spark.sql("DROP TABLE graft.db1.t")
    assert(rows("SHOW TABLES IN graft.db1").isEmpty)
  }

  test("delta format: partitioned create, insert inherits layout, overwrite keeps it, time travel") {
    wipe("db2")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db2")
    spark.sql("""CREATE TABLE graft.db2.d (k BIGINT, v STRING, grp BIGINT)
                 USING delta PARTITIONED BY (grp)""")
    spark.sql("INSERT INTO graft.db2.d VALUES (1, 'a', 0), (2, 'b', 1)") // delta v1
    spark.sql("INSERT INTO graft.db2.d VALUES (3, 'c', 0)")              // delta v2
    assert(rows("SELECT k FROM graft.db2.d ORDER BY k") == Seq(Seq(1L), Seq(2L), Seq(3L)))
    // the layout survived the catalog inserts: partition dirs on disk
    val tdir = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_test", "warehouse", "db2", "d")
    assert(java.nio.file.Files.list(tdir).toArray.map(_.toString)
      .exists(_.endsWith("grp=0")), "delta catalog insert lost the partition layout")
    assert(DeltaLake.snapshot(spark, tdir.toString).partitionColumns == Seq("grp"))
    // time travel by version and timestamp
    assert(rows("SELECT count(*) AS n FROM graft.db2.d VERSION AS OF 1") == Seq(Seq(2L)))
    val nowTs = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
      .plusMinutes(5).toString.replace("T", " ")
    assert(rows(s"SELECT count(*) AS n FROM graft.db2.d TIMESTAMP AS OF '$nowTs'") ==
      Seq(Seq(3L)))
    // INSERT OVERWRITE keeps the declared layout
    spark.sql("INSERT OVERWRITE graft.db2.d VALUES (7, 'x', 5)")
    assert(rows("SELECT k, grp FROM graft.db2.d") == Seq(Seq(7L, 5L)))
    assert(DeltaLake.snapshot(spark, tdir.toString).partitionColumns == Seq("grp"))
    // DML on the catalog name
    spark.sql("DELETE FROM graft.db2.d WHERE k = 7")
    assert(rows("SELECT count(*) AS n FROM graft.db2.d") == Seq(Seq(0L)))
    spark.sql("ALTER TABLE graft.db2.d ADD COLUMN note STRING")
    assert(spark.table("graft.db2.d").columns.toSeq == Seq("k", "v", "note", "grp") ||
      spark.table("graft.db2.d").columns.toSeq == Seq("k", "v", "grp", "note"))
    // SHOW CREATE TABLE carries the provider AND the partitioning
    val ddl = rows("SHOW CREATE TABLE graft.db2.d").head.head.toString
    assert(ddl.contains("USING delta") && ddl.contains("PARTITIONED BY (grp)"),
      s"unexpected DDL: $ddl")
    // TBLPROPERTIES: free-form keys round-trip; delta.* behavior keys
    // refuse (they are owned by their feature-ratcheting APIs)
    spark.sql("ALTER TABLE graft.db2.d SET TBLPROPERTIES ('owner.team' = 'ingest')")
    assert(spark.sql("SHOW TBLPROPERTIES graft.db2.d").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
      .get("owner.team").contains("ingest"))
    val behavioral = intercept[Exception](spark.sql(
      "ALTER TABLE graft.db2.d SET TBLPROPERTIES ('delta.enableChangeDataFeed' = 'true')"))
    assert(behavioral.getMessage.contains("behavior keys"))
  }

  test("iceberg format: transform partitions via SQL, snapshot time travel, MERGE") {
    wipe("db3")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db3")
    spark.sql("""CREATE TABLE graft.db3.i (k BIGINT, v STRING)
                 USING iceberg PARTITIONED BY (bucket(4, k))""")
    spark.sql("INSERT INTO graft.db3.i VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    assert(rows("SELECT k FROM graft.db3.i ORDER BY k") == Seq(Seq(1L), Seq(2L), Seq(3L)))
    val tdir = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_test", "warehouse", "db3", "i").toString
    val s1 = Iceberg.snapshot(spark, tdir)
    assert(s1.partFields.map(_.transform.spec) == Seq("bucket[4]"),
      "CREATE ... PARTITIONED BY (bucket(4, k)) must land in the partition spec")
    // snapshot-id time travel through SQL
    spark.sql("INSERT INTO graft.db3.i VALUES (4, 'd')")
    assert(rows(s"SELECT count(*) AS n FROM graft.db3.i VERSION AS OF ${s1.snapshotId}") ==
      Seq(Seq(3L)))
    assert(rows("SELECT count(*) AS n FROM graft.db3.i") == Seq(Seq(4L)))
    // a NAMED REF pins the same snapshot: VERSION AS OF 'tag'
    Iceberg.createRef(spark, tdir, "v1", s1.snapshotId)
    assert(rows("SELECT count(*) AS n FROM graft.db3.i VERSION AS OF 'v1'") ==
      Seq(Seq(3L)))
    val noRef = intercept[Exception](
      spark.sql("SELECT * FROM graft.db3.i VERSION AS OF 'nope'").collect())
    assert(noRef.getMessage.contains("no such ref"))
    // SET/UNSET TBLPROPERTIES round-trip through SHOW TBLPROPERTIES,
    // and survive a write (the metadata carries properties forward)
    spark.sql("ALTER TABLE graft.db3.i SET TBLPROPERTIES ('owner.team' = 'ingest')")
    spark.sql("INSERT INTO graft.db3.i VALUES (9, 'z')")
    def props() = spark.sql("SHOW TBLPROPERTIES graft.db3.i").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props().get("owner.team").contains("ingest"))
    spark.sql("ALTER TABLE graft.db3.i UNSET TBLPROPERTIES ('owner.team')")
    assert(!props().contains("owner.team"))
    val reserved = intercept[Exception](spark.sql(
      "ALTER TABLE graft.db3.i SET TBLPROPERTIES ('schema.name-mapping.default' = '[]')"))
    assert(reserved.getMessage.contains("writer-managed"))
    // MERGE through the catalog name lands the interop command
    spark.sql("""MERGE INTO graft.db3.i t USING (SELECT 4L AS k, 'D' AS v) s
                 ON t.k = s.k WHEN MATCHED THEN UPDATE SET *""")
    assert(rows("SELECT v FROM graft.db3.i WHERE k = 4") == Seq(Seq("D")))
    spark.sql("ALTER TABLE graft.db3.i RENAME COLUMN v TO label")
    assert(spark.table("graft.db3.i").columns.toSeq == Seq("k", "label"))
  }

  test("CTAS creates and fills in one statement; renameTable moves the directory") {
    wipe("db4")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db4")
    spark.sql("""CREATE TABLE graft.db4.c USING delta AS
                 SELECT id AS k, CAST(id % 3 AS STRING) AS v FROM range(10)""")
    assert(rows("SELECT count(*) AS n FROM graft.db4.c") == Seq(Seq(10L)))
    spark.sql("ALTER TABLE graft.db4.c RENAME TO graft.db4.c2")
    assert(rows("SELECT count(*) AS n FROM graft.db4.c2") == Seq(Seq(10L)))
    assert(rows("SHOW TABLES IN graft.db4").map(_(1)) == Seq("c2"))
    // path-written tables are instantly addressable by name (no
    // registration step — the catalog reads the on-disk signature)
    import spark.implicits._
    val pdir = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_test", "warehouse", "db4", "side").toString
    Iceberg.write(Seq((1L, "x")).toDF("k", "v"), pdir)
    assert(rows("SELECT v FROM graft.db4.side WHERE k = 1") == Seq(Seq("x")))
    assert(rows("SHOW TABLES IN graft.db4").map(_(1).toString).sorted == Seq("c2", "side"))
  }

  test("reads through the catalog keep FileIndex pruning") {
    wipe("db5")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.db5")
    spark.sql("""CREATE TABLE graft.db5.p (k BIGINT, grp BIGINT)
                 USING graft PARTITIONED BY (grp)""")
    spark.sql("INSERT INTO graft.db5.p SELECT id, id % 4 FROM range(100)")
    val tdir = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_test", "warehouse", "db5", "p").toString
    assert(rows("SELECT count(*) AS n FROM graft.db5.p WHERE grp = 2") == Seq(Seq(25L)))
    val (kept, total) = org.apache.spark.sql.graft.VersionedFileIndex.lastPlanned(tdir).get
    assert(kept < total,
      s"partition filter through the catalog name must prune at planning ($kept/$total)")
  }

  test("table_changes TVF: graft format serves the keyed feed over a version window") {
    wipe("dbc1")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbc1")
    spark.sql("CREATE TABLE graft.dbc1.t (k BIGINT, v STRING) USING graft")
    spark.sql("INSERT INTO graft.dbc1.t VALUES (1, 'a'), (2, 'b')") // v2
    spark.sql("INSERT INTO graft.dbc1.t VALUES (3, 'c')")           // v3
    spark.sql("DELETE FROM graft.dbc1.t WHERE k = 1")               // v4
    // graft feeds are keyed diffs: the key column is the 4th argument
    // (this format's feed columns are change_type/commit_version)
    val feed = rows("""SELECT change_type, k FROM
      table_changes('graft.dbc1.t', 3, 4, 'k') ORDER BY change_type, k""")
    assert(feed == Seq(Seq("delete", 1L), Seq("insert", 3L)))
    // without the key, a graft table refuses with guidance
    val e = intercept[Exception](
      spark.sql("SELECT * FROM table_changes('graft.dbc1.t', 3)").collect())
    assert(e.getMessage.contains("key"))
  }

  test("table_changes TVF: iceberg serves the changelog with inclusive versions") {
    wipe("dbc2")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbc2")
    spark.sql("CREATE TABLE graft.dbc2.t (k BIGINT, v STRING) USING iceberg")
    // the empty CREATE takes sequence 1; the inserts land at 2/3/4
    spark.sql("INSERT INTO graft.dbc2.t VALUES (1, 'a')") // seq 2
    spark.sql("INSERT INTO graft.dbc2.t VALUES (2, 'b')") // seq 3
    spark.sql("INSERT INTO graft.dbc2.t VALUES (3, 'c')") // seq 4
    // the TVF window is INCLUSIVE start..end in sequence numbers
    assert(rows("""SELECT _change_type, k FROM
        table_changes('graft.dbc2.t', 3, 4) ORDER BY k""") ==
      Seq(Seq("insert", 2L), Seq("insert", 3L)))
    assert(rows("SELECT count(*) AS n FROM table_changes('graft.dbc2.t', 1)") ==
      Seq(Seq(3L)))
  }

  test("table_changes TVF: argument validation refuses loudly") {
    val e1 = intercept[Exception](
      spark.sql("SELECT * FROM table_changes('no_dot_name', 1)").collect())
    assert(e1.getMessage.contains("namespace.table"))
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM table_changes('a.b')").collect())
    assert(e2.getMessage.contains("table_changes"))
  }
}
