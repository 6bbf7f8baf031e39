package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** TYPE WIDENING, the symmetric pair (r10 verdict "missing #1"):
  * Delta's `typeWidening` reader+writer table feature and Iceberg's
  * spec type-promotion rules. Both are METADATA-ONLY — zero data files
  * rewritten — and both serve pre-widen files through scan-time
  * upcasts (int32 read as long, float as double, re-scaled decimals).
  * Narrowing and cross-family moves refuse loudly on both. */
class TypeWideningSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def narrow(n: Int) = {
    import org.apache.spark.sql.functions.{expr, lit}
    spark.range(0, n.toLong).select(
      col("id").cast(IntegerType).as("k"),
      (col("id") * 2).cast(FloatType).as("f"),
      expr("cast(id as decimal(10,2)) * 1.5").cast(DecimalType(10, 2)).as("d"),
      lit("x").as("s"))
  }

  // ------------------------------------------------------------ delta

  test("delta: widening is metadata-only; pre-widen files upcast; wide appends land") {
    val path = freshDir("tw_delta")
    DeltaLake.write(narrow(100).repartition(2), path)
    val pre = DeltaLake.snapshot(spark, path).files.map(_.path).toSet
    DeltaLake.widenColumnType(spark, path, "k", LongType)
    DeltaLake.widenColumnType(spark, path, "f", DoubleType)
    DeltaLake.widenColumnType(spark, path, "d", DecimalType(20, 2))
    val snap = DeltaLake.snapshot(spark, path)
    assert(snap.files.map(_.path).toSet == pre, "widen rewrites zero files")
    assert(snap.protocol.readerFeatures.contains("typeWidening") &&
      snap.protocol.writerFeatures.contains("typeWidening"),
      "typeWidening is a reader+writer feature — both lists ratchet")
    assert(snap.schema("k").dataType == LongType &&
      snap.schema("f").dataType == DoubleType &&
      snap.schema("d").dataType == DecimalType(20, 2))
    // the spec's delta.typeChanges history rides the field metadata
    // (rawSchema — the served logical schema strips log bookkeeping)
    val tc = snap.rawSchema("k").metadata.getMetadataArray("delta.typeChanges")
    assert(tc.length == 1 && tc.head.getString("fromType") == "integer" &&
      tc.head.getString("toType") == "long")
    // pre-widen rows read upcast
    val rows = DeltaLake.read(spark, path)
    assert(rows.schema("k").dataType == LongType)
    assert(rows.filter(col("k") === 42L).count() == 1L)
    assert(rows.filter(col("f") === 84.0d).count() == 1L)
    // a post-widen append holds values the narrow type never could
    import spark.implicits._
    DeltaLake.write(Seq((5000000000L, 1e40, "123456789012345678.00", "y"))
      .toDF("k", "f", "d", "s")
      .select(col("k"), col("f"), col("d").cast(DecimalType(20, 2)), col("s")),
      path, mode = SaveMode.Append)
    val all = DeltaLake.read(spark, path)
    assert(all.filter(col("k") === 5000000000L).count() == 1L)
    assert(all.count() == 101L)
  }

  test("delta: narrowing and illegal promotions refuse; partition columns refuse") {
    val path = freshDir("tw_delta_refuse")
    DeltaLake.write(narrow(10), path)
    assertThrows[IllegalArgumentException](
      DeltaLake.widenColumnType(spark, path, "k", ShortType)) // narrowing
    assertThrows[IllegalArgumentException](
      DeltaLake.widenColumnType(spark, path, "s", IntegerType)) // cross-family
    assertThrows[IllegalArgumentException](
      DeltaLake.widenColumnType(spark, path, "d", DecimalType(20, 4))) // scale change
    assertThrows[IllegalArgumentException](
      DeltaLake.widenColumnType(spark, path, "nope", LongType)) // unknown column
    val part = freshDir("tw_delta_part")
    DeltaLake.write(narrow(10), part, partitionBy = Seq("k"))
    assertThrows[IllegalArgumentException](
      DeltaLake.widenColumnType(spark, part, "k", LongType)) // partition column
  }

  // ---------------------------------------------------------- iceberg

  test("iceberg: spec promotion is a new schema version; old bounds keep pruning") {
    val path = freshDir("tw_ice")
    Iceberg.write(narrow(1000).repartitionByRange(4, col("k")), path)
    val pre = Iceberg.files(spark, path).collect().map(_.getString(0)).toSet
    Iceberg.widenColumnType(spark, path, "k", LongType)
    Iceberg.widenColumnType(spark, path, "f", DoubleType)
    Iceberg.widenColumnType(spark, path, "d", DecimalType(20, 2))
    assert(Iceberg.files(spark, path).collect().map(_.getString(0)).toSet == pre,
      "promotion rewrites zero files")
    val rows = Iceberg.read(spark, path)
    assert(rows.schema("k").dataType == LongType &&
      rows.schema("f").dataType == DoubleType &&
      rows.schema("d").dataType == DecimalType(20, 2))
    assert(rows.filter(col("k") === 42L).count() == 1L)
    // pre-widen manifests carry 4-byte int bounds under the now-long
    // field — decodeBound upcasts them, so planning still skips files
    val (kept, total) = org.apache.spark.sql.graft.VersionedFileIndex.lastPlanned(path).get
    assert(total >= 4 && kept < total,
      s"pre-widen bounds must keep pruning after the promotion ($kept/$total)")
    // a post-widen append holds long-range values; both eras union
    import spark.implicits._
    Iceberg.write(Seq((5000000000L, 1e40, "123456789012345678.00", "y"))
      .toDF("k", "f", "d", "s")
      .select(col("k"), col("f"), col("d").cast(DecimalType(20, 2)), col("s")),
      path, mode = SaveMode.Append)
    val all = Iceberg.read(spark, path)
    assert(all.filter(col("k") === 5000000000L).count() == 1L && all.count() == 1001L)
  }

  test("iceberg: non-promotions refuse; partition sources refuse; v1 refuses") {
    val path = freshDir("tw_ice_refuse")
    Iceberg.write(narrow(10), path)
    assertThrows[IllegalArgumentException](
      Iceberg.widenColumnType(spark, path, "k", IntegerType)) // same type
    assertThrows[IllegalArgumentException](
      Iceberg.widenColumnType(spark, path, "f", FloatType)) // same type
    assertThrows[IllegalArgumentException](
      Iceberg.widenColumnType(spark, path, "s", LongType)) // cross-family
    assertThrows[IllegalArgumentException](
      Iceberg.widenColumnType(spark, path, "d", DecimalType(8, 2))) // narrowing
    assertThrows[IllegalArgumentException](
      Iceberg.widenColumnType(spark, path, "gone", LongType)) // unknown
    val part = freshDir("tw_ice_part")
    Iceberg.write(narrow(10), part, partitionBy = Seq("k"))
    assertThrows[IllegalArgumentException](
      Iceberg.widenColumnType(spark, part, "k", LongType)) // partition source
  }

  // ------------------------------------------------------------- SQL

  test("SQL: ALTER COLUMN TYPE through the graft catalog; graft-native refuses") {
    import spark.implicits._
    val whd = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_test", "warehouse", "dbtw")
    Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbtw")
    DeltaLake.write(narrow(20), whd.resolve("td").toString)
    spark.sql("ALTER TABLE graft.dbtw.td ALTER COLUMN k TYPE BIGINT")
    assert(spark.table("graft.dbtw.td").schema("k").dataType == LongType)
    assert(spark.sql("SELECT sum(k) FROM graft.dbtw.td").collect()
      .head.getLong(0) == 190L)
    Iceberg.write(narrow(20), whd.resolve("ti").toString)
    spark.sql("ALTER TABLE graft.dbtw.ti ALTER COLUMN f TYPE DOUBLE")
    assert(spark.table("graft.dbtw.ti").schema("f").dataType == DoubleType)
    // NARROWING dies in Spark's own analyzer (canUpCast gate) before
    // the catalog is reached — still a loud refusal, never a commit
    val errNarrow = intercept[Exception](
      spark.sql("ALTER TABLE graft.dbtw.ti ALTER COLUMN k TYPE SMALLINT"))
    assert(errNarrow.getMessage.toUpperCase.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
    // an up-cast Spark admits but the FORMAT's promotion rules refuse
    // (int→decimal is not an Iceberg spec promotion) hits OUR gate
    val err = intercept[Exception](
      spark.sql("ALTER TABLE graft.dbtw.ti ALTER COLUMN k TYPE DECIMAL(11,0)"))
    assert(err.getMessage.toLowerCase.contains("promotion") ||
      err.getMessage.toLowerCase.contains("widen"))
    // graft-native widens through the same SQL surface (the symmetric
    // third format): metadata-only, old files upcast at scan time
    graft.ingest.Versioned.commit(Seq((1, "a"), (2, "b")).toDF("k", "s"),
      whd.resolve("tg").toString)
    spark.sql("ALTER TABLE graft.dbtw.tg ALTER COLUMN k TYPE BIGINT")
    assert(spark.table("graft.dbtw.tg").schema("k").dataType == LongType)
    assert(spark.sql("SELECT sum(k) FROM graft.dbtw.tg").collect().head.getLong(0) == 3L)
  }

  // ------------------------------------------------------------ graft

  test("graft-native: widening is metadata-only; eras union at the wide type") {
    import spark.implicits._
    val V = graft.ingest.Versioned
    val path = freshDir("tw_graft")
    V.commit(narrow(50), path)
    val preVersion = V.currentVersion(path).get
    V.widenColumn(spark, path, "k", LongType)
    V.widenColumn(spark, path, "f", DoubleType)
    V.widenColumn(spark, path, "d", DecimalType(20, 2))
    // three metadata-only derived commits, zero data files added
    assert(V.currentVersion(path).contains(preVersion + 3))
    assert(V.history(spark, path).filter(col("version") > preVersion)
      .collect().forall(r => r.getLong(3) == 0L && r.getLong(4) == 0L),
      "widen commits move zero files")
    val rows = V.read(spark, path)
    assert(rows.schema("k").dataType == LongType &&
      rows.schema("f").dataType == DoubleType &&
      rows.schema("d").dataType == DecimalType(20, 2),
      "pre-widen files must serve the WIDENED types, not their physical ones")
    assert(rows.filter(col("k") === 42L).count() == 1L)
    // a post-widen append holds long-range values; both eras union
    V.appendCommit(Seq((5000000000L, 1e40, "1.50", "y")).toDF("k", "f", "d", "s")
      .select(col("k"), col("f"), col("d").cast(DecimalType(20, 2)), col("s")), path)
    val all = V.read(spark, path)
    assert(all.count() == 51L && all.filter(col("k") === 5000000000L).count() == 1L)
    // stats keep pruning across the era boundary (numeric compare)
    assert(V.readSkipping(spark, path, "k", 5000000000L, 6000000000L).count() == 1L)
    // time travel below the widening presents the NARROW committed schema
    assert(V.readAt(spark, path, preVersion).schema("k").dataType == IntegerType)
    // refusals: narrowing, cross-family, partition columns
    assertThrows[IllegalArgumentException](V.widenColumn(spark, path, "k", IntegerType))
    assertThrows[IllegalArgumentException](V.widenColumn(spark, path, "s", LongType))
    val pp = freshDir("tw_graft_part")
    V.commitPartitioned(narrow(10).withColumn("p", (col("k") % 2).cast("string")), pp, "p")
    assertThrows[IllegalArgumentException](V.widenColumn(spark, pp, "p", LongType))
  }

  test("graft-native: a bloom-indexed column refuses the hash-domain crossing") {
    import spark.implicits._
    val V = graft.ingest.Versioned
    val path = freshDir("tw_graft_bloom")
    V.commit(spark.range(0, 2000).select(col("id").cast(IntegerType).as("k"),
      col("id").as("v")).repartition(4, col("k")), path, bloomCols = Seq("k"))
    // int -> long crosses the xxhash64 domain: a long probe would MISS
    // int-recorded membership and readSkippingEq would wrongly skip
    val e = intercept[IllegalArgumentException](V.widenColumn(spark, path, "k", LongType))
    assert(e.getMessage.contains("bloom"))
    // after a compaction rewrite (which re-blooms nothing), the widen
    // lands — a single-owner all-data snapshot is compactFiles' no-op,
    // so force the rewrite with a file target
    V.compactFiles(spark, path, numFiles = Some(1))
    V.widenColumn(spark, path, "k", LongType)
    assert(V.read(spark, path).schema("k").dataType == LongType)
    assert(V.read(spark, path).count() == 2000L)
  }
}
