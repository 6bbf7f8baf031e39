package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** COLUMN DEFAULTS, the symmetric pair: Delta's `allowColumnDefaults`
  * writer feature (`CURRENT_DEFAULT` field metadata — writers fill
  * omitted columns, rows already written keep what they have) and
  * Iceberg v3's `write-default` / `initial-default` (write fills new
  * rows; initial serves rows predating the column and is immutable).
  */
class ColumnDefaultsSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def frame(n: Int, withTag: Boolean) = {
    import spark.implicits._
    val base = (1 to n).map(i => (i.toLong, s"r$i"))
    if (withTag) base.map { case (k, s) => (k, s, "explicit") }.toDF("k", "s", "tag")
    else base.toDF("k", "s")
  }

  // ------------------------------------------------------------ delta

  test("delta: setColumnDefault ratchets the feature and fills omitted columns in order") {
    val path = freshDir("dflt_delta")
    // `tag` sits MID-SCHEMA — the fill must land it back in place
    DeltaLake.write(frame(4, withTag = true).select("k", "tag", "s"), path)
    DeltaLake.setColumnDefault(spark, path, "tag", "'web'")
    val snap = DeltaLake.snapshot(spark, path)
    assert(snap.protocol.writerFeatures.contains("allowColumnDefaults"))
    DeltaLake.write(frame(4, withTag = false)
      .withColumn("k", col("k") + 100).select("k", "s"), path, mode = SaveMode.Append)
    val rows = DeltaLake.read(spark, path)
    assert(rows.columns.toSeq == Seq("k", "tag", "s"), "column order preserved")
    assert(rows.filter(col("k") > 100 && col("tag") === "web").count() == 4L)
    assert(rows.filter(col("tag") === "explicit").count() == 4L,
      "carried rows keep their explicit values")
    // a frame that CARRIES the column is untouched by the default
    DeltaLake.write(frame(1, withTag = true)
      .withColumn("k", col("k") + 200).select("k", "tag", "s"), path,
      mode = SaveMode.Append)
    assert(DeltaLake.read(spark, path).filter(col("k") > 200)
      .select("tag").collect().head.getString(0) == "explicit")
  }

  test("delta: clearColumnDefault stops filling; refusals are loud") {
    val path = freshDir("dflt_delta_clear")
    DeltaLake.write(frame(2, withTag = true), path)
    DeltaLake.setColumnDefault(spark, path, "tag", "'x'")
    DeltaLake.clearColumnDefault(spark, path, "tag")
    // no default anymore: an append omitting the column is the
    // long-standing schema-mismatch refusal again
    assertThrows[IllegalArgumentException](
      DeltaLake.write(frame(1, withTag = false), path, mode = SaveMode.Append))
    assertThrows[IllegalArgumentException](
      DeltaLake.clearColumnDefault(spark, path, "tag")) // nothing to clear
    assertThrows[IllegalArgumentException](
      DeltaLake.setColumnDefault(spark, path, "nope", "'x'"))
    assertThrows[IllegalArgumentException](
      DeltaLake.setColumnDefault(spark, path, "tag", "k + 1")) // not constant
    DeltaLake.addGeneratedColumn(spark, path, "k2", org.apache.spark.sql.types.LongType, "k * 2")
    assertThrows[IllegalArgumentException](
      DeltaLake.setColumnDefault(spark, path, "k2", "5")) // generated
  }

  // ---------------------------------------------------------- iceberg

  test("iceberg: add-with-default fills appends via write-default; initial immutable") {
    val path = freshDir("dflt_ice")
    Iceberg.write(frame(3, withTag = false), path)
    Iceberg.upgradeToV3(spark, path)
    Iceberg.addColumn(spark, path, "tag", StringType, initialDefault = Some("legacy"))
    // pre-column rows read the initial default
    assert(Iceberg.read(spark, path).filter(col("tag") === "legacy").count() == 3L)
    assert(Iceberg.writeDefaults(path) == Map("tag" -> "'legacy'"))
    // an append omitting the column materializes the WRITE default
    Iceberg.write(frame(2, withTag = false)
      .withColumn("k", col("k") + 100).select("k", "s"), path, mode = SaveMode.Append)
    assert(Iceberg.read(spark, path).filter(col("tag") === "legacy").count() == 5L)
    // ALTER the write default: new rows flip, old rows and the
    // initial default do not
    Iceberg.setWriteDefault(spark, path, "tag", Some("fresh"))
    Iceberg.write(frame(2, withTag = false)
      .withColumn("k", col("k") + 200).select("k", "s"), path, mode = SaveMode.Append)
    val byTag = Iceberg.read(spark, path).groupBy("tag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTag == Map("legacy" -> 5L, "fresh" -> 2L))
    // CLEAR: an append omitting the column refuses again
    Iceberg.setWriteDefault(spark, path, "tag", None)
    assertThrows[IllegalArgumentException](
      Iceberg.write(frame(1, withTag = false), path, mode = SaveMode.Append))
  }

  test("iceberg: schema evolution re-emit carries defaults forward") {
    val path = freshDir("dflt_ice_evolve")
    Iceberg.write(frame(3, withTag = false), path)
    Iceberg.upgradeToV3(spark, path)
    Iceberg.addColumn(spark, path, "tag", StringType, initialDefault = Some("legacy"))
    // a mergeSchema append ADDS a new column — the re-emitted schema
    // node must carry tag's initial-default/write-default, or the 3
    // pre-column rows silently flip to null
    Iceberg.write(frame(2, withTag = false)
      .withColumn("k", col("k") + 50).withColumn("extra", col("k") * 2)
      .select("k", "s", "extra"), path, mode = SaveMode.Append, mergeSchema = true)
    val rows = Iceberg.read(spark, path)
    assert(rows.filter(col("tag") === "legacy").count() == 5L,
      "defaults must survive a schema re-emit")
    assert(Iceberg.writeDefaults(path) == Map("tag" -> "'legacy'"))
  }

  test("iceberg: refusals — v2 table, unknown column, unservable type") {
    val path = freshDir("dflt_ice_refuse")
    Iceberg.write(frame(2, withTag = false), path)
    assertThrows[IllegalArgumentException](
      Iceberg.setWriteDefault(spark, path, "s", Some("x"))) // v2
    assertThrows[IllegalArgumentException](
      Iceberg.addColumn(spark, path, "c", IntegerType,
        initialDefault = Some("5"))) // add-with-default is v3-only too
    Iceberg.upgradeToV3(spark, path)
    assertThrows[IllegalArgumentException](
      Iceberg.setWriteDefault(spark, path, "nope", Some("x")))
  }

  // ------------------------------------------------------------- SQL

  test("SQL: CREATE TABLE with DEFAULT lands per-format; INSERT column lists fill") {
    import spark.implicits._
    val whd = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_test", "warehouse", "dbcd")
    Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbcd")
    // delta: CREATE records CURRENT_DEFAULT + the feature; both the
    // analyzer (SQL column-list INSERT) and this library's writer fill
    spark.sql("CREATE TABLE graft.dbcd.td (k BIGINT, tag STRING DEFAULT 'fresh') USING delta")
    val td = whd.resolve("td").toString
    assert(DeltaLake.snapshot(spark, td).protocol.writerFeatures
      .contains("allowColumnDefaults"))
    spark.sql("INSERT INTO graft.dbcd.td (k) VALUES (1)")
    DeltaLake.write(Seq(Tuple1(2L)).toDF("k"), td, mode = SaveMode.Append)
    assert(spark.sql("SELECT tag FROM graft.dbcd.td ORDER BY k").collect()
      .map(_.getString(0)).toSeq == Seq("fresh", "fresh"))
    // iceberg: the create upgrades to v3 and records write-default
    spark.sql("CREATE TABLE graft.dbcd.ti (k BIGINT, tag STRING DEFAULT 'fresh') USING iceberg")
    val ti = whd.resolve("ti").toString
    assert(Iceberg.writeDefaults(ti) == Map("tag" -> "'fresh'"))
    spark.sql("INSERT INTO graft.dbcd.ti (k) VALUES (1)")
    Iceberg.write(Seq(Tuple1(2L)).toDF("k"), ti, mode = SaveMode.Append)
    assert(spark.sql("SELECT tag FROM graft.dbcd.ti ORDER BY k").collect()
      .map(_.getString(0)).toSeq == Seq("fresh", "fresh"))
    // graft-native: the schema-metadata defaults contract — CREATE
    // records, the analyzer AND the library writer both fill
    spark.sql("CREATE TABLE graft.dbcd.tg (k BIGINT, tag STRING DEFAULT 'x') USING graft")
    val tg = whd.resolve("tg").toString
    assert(graft.ingest.Versioned.columnDefaults(tg) == Map("tag" -> "'x'"))
    spark.sql("INSERT INTO graft.dbcd.tg (k) VALUES (1)")
    graft.ingest.Versioned.appendCommit(Seq(Tuple1(2L)).toDF("k"), tg)
    assert(spark.sql("SELECT tag FROM graft.dbcd.tg ORDER BY k").collect()
      .map(_.getString(0)).toSeq == Seq("x", "x"))
  }

  test("graft-native: setColumnDefault fills appends; clear restores the refusal") {
    import spark.implicits._
    val V = graft.ingest.Versioned
    val path = freshDir("dflt_graft")
    V.commit(Seq((1L, "r1", "explicit")).toDF("k", "s", "tag"), path)
    V.setColumnDefault(spark, path, "tag", "'web'")
    // an append omitting the column fills; carried rows keep theirs
    V.appendCommit(Seq((2L, "r2")).toDF("k", "s"), path)
    val rows = V.read(spark, path)
    assert(rows.columns.toSeq == Seq("k", "s", "tag"), "column order preserved")
    assert(rows.filter(col("k") === 2L).head().getString(2) == "web")
    assert(rows.filter(col("k") === 1L).head().getString(2) == "explicit")
    // a frame that CARRIES the column is untouched — and the commit
    // must not strip the declared default from the published schema
    V.appendCommit(Seq((3L, "r3", "explicit")).toDF("k", "s", "tag"), path)
    assert(V.columnDefaults(path) == Map("tag" -> "'web'"),
      "an all-columns append must not strip the default metadata")
    V.appendCommitOnce(Seq((4L, "r4")).toDF("k", "s"), path, "b9")
    assert(V.read(spark, path).filter(col("tag") === "web").count() == 2L)
    // a MERGE must not strip the declaration either (r13 regression:
    // the upsert published its joined frame's schema, whose attribute
    // metadata the union had dropped — the default silently vanished)
    V.upsert(spark, path, Seq((2L, "r2u", "upd")).toDF("k", "s", "tag"), "k")
    assert(V.columnDefaults(path) == Map("tag" -> "'web'"),
      "a merge must republish the declared default metadata")
    V.appendCommit(Seq((5L, "r5")).toDF("k", "s"), path)
    assert(V.read(spark, path).filter(col("k") === 5L).head().getString(2) == "web",
      "the default must still fill after a merge")
    // maintenance rewrites must keep it too — the compacted frame is
    // derived from data files that may PREDATE the declaration
    V.compactFiles(spark, path)
    assert(V.columnDefaults(path) == Map("tag" -> "'web'"),
      "compaction must republish the declared default metadata")
    // clear: omitting the column is a schema-evolution append again
    // (publishes the narrower frame schema — the pre-defaults shape)
    V.clearColumnDefault(spark, path, "tag")
    assert(V.columnDefaults(path).isEmpty)
    // refusals: unknown column, non-constant, partition column
    assertThrows[IllegalArgumentException](
      V.setColumnDefault(spark, path, "nope", "'x'"))
    assertThrows[IllegalArgumentException](
      V.setColumnDefault(spark, path, "tag", "k + 1"))
    val pp = freshDir("dflt_graft_part")
    V.commitPartitioned(Seq((1L, "P1")).toDF("k", "p"), pp, "p")
    assertThrows[IllegalArgumentException](
      V.setColumnDefault(spark, pp, "p", "'P9'"))
  }

  test("SQL: DATE/TIMESTAMP defaults fold to spec serializations, not internal ints") {
    import spark.implicits._
    val whd = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_test", "warehouse", "dbcdt")
    Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbcdt")
    // eval() yields days-since-epoch / epoch-micros; the committed
    // write-default must be the ISO rendering or every later
    // default-filling write parses DATE '19723' and dies
    spark.sql("""CREATE TABLE graft.dbcdt.ti (
      k BIGINT,
      d DATE DEFAULT DATE '2024-01-01',
      ts TIMESTAMP DEFAULT TIMESTAMP '2024-01-01 12:30:00',
      tn TIMESTAMP_NTZ DEFAULT TIMESTAMP_NTZ '2024-06-01 07:00:00'
    ) USING iceberg""")
    val ti = whd.resolve("ti").toString
    val defs = Iceberg.writeDefaults(ti)
    assert(defs("d") == "DATE '2024-01-01'", s"got ${defs("d")}")
    assert(defs("tn") == "TIMESTAMP_NTZ '2024-06-01T07:00:00.000000'", s"got ${defs("tn")}")
    assert(defs("ts").startsWith("TIMESTAMP '") && defs("ts").contains("+00:00"),
      s"timestamptz must serialize with an explicit UTC offset, got ${defs("ts")}")
    // the defaults actually FILL — both the analyzer path and the
    // library writer path parse the committed serialization back
    spark.sql("INSERT INTO graft.dbcdt.ti (k) VALUES (1)")
    Iceberg.write(Seq(Tuple1(2L)).toDF("k"), ti, mode = SaveMode.Append)
    val ok = spark.sql("""SELECT count(*) FROM graft.dbcdt.ti
      WHERE d = DATE '2024-01-01'
        AND ts = TIMESTAMP '2024-01-01 12:30:00'
        AND tn = TIMESTAMP_NTZ '2024-06-01 07:00:00'""").collect().head.getLong(0)
    assert(ok == 2L, "both default-filled rows read the literal values back")
    // ALTER ... SET DEFAULT rides the same folding
    spark.sql("ALTER TABLE graft.dbcdt.ti ALTER COLUMN d SET DEFAULT DATE '2025-02-03'")
    Iceberg.write(Seq(Tuple1(3L)).toDF("k"), ti, mode = SaveMode.Append)
    assert(spark.sql("SELECT d FROM graft.dbcdt.ti WHERE k = 3").collect()
      .head.getDate(0).toString == "2025-02-03")
  }

  test("SQL: ALTER COLUMN SET/DROP DEFAULT through the graft catalog") {
    import spark.implicits._
    val whd = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_test", "warehouse", "dbdflt")
    Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbdflt")
    // delta leg
    DeltaLake.write(Seq((1L, "a", "explicit")).toDF("k", "s", "tag"),
      whd.resolve("td").toString)
    spark.sql("ALTER TABLE graft.dbdflt.td ALTER COLUMN tag SET DEFAULT 'sqld'")
    DeltaLake.write(Seq((2L, "b")).toDF("k", "s"), whd.resolve("td").toString,
      mode = SaveMode.Append)
    assert(spark.sql("SELECT tag FROM graft.dbdflt.td WHERE k = 2").collect()
      .head.getString(0) == "sqld")
    spark.sql("ALTER TABLE graft.dbdflt.td ALTER COLUMN tag DROP DEFAULT")
    assertThrows[IllegalArgumentException](
      DeltaLake.write(Seq((3L, "c")).toDF("k", "s"), whd.resolve("td").toString,
        mode = SaveMode.Append))
    // iceberg leg (typed: the SQL literal folds to a bare value)
    val ti = whd.resolve("ti").toString
    Iceberg.write(Seq((1L, 0)).toDF("k", "n"), ti)
    Iceberg.upgradeToV3(spark, ti)
    spark.sql("ALTER TABLE graft.dbdflt.ti ALTER COLUMN n SET DEFAULT 7")
    Iceberg.write(Seq(Tuple1(2L)).toDF("k"), ti, mode = SaveMode.Append)
    assert(spark.sql("SELECT n FROM graft.dbdflt.ti WHERE k = 2").collect()
      .head.getInt(0) == 7)
    // graft-native leg through the same SQL surface
    val tg = whd.resolve("tg").toString
    graft.ingest.Versioned.commit(Seq((1L, "a")).toDF("k", "s"), tg)
    spark.sql("ALTER TABLE graft.dbdflt.tg ALTER COLUMN s SET DEFAULT 'sqlg'")
    graft.ingest.Versioned.appendCommit(Seq(Tuple1(2L)).toDF("k"), tg)
    assert(spark.sql("SELECT s FROM graft.dbdflt.tg WHERE k = 2").collect()
      .head.getString(0) == "sqlg")
    spark.sql("ALTER TABLE graft.dbdflt.tg ALTER COLUMN s DROP DEFAULT")
    assert(graft.ingest.Versioned.columnDefaults(tg).isEmpty)
  }
}
