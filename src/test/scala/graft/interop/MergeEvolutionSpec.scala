package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

/** MERGE SCHEMA EVOLUTION (`upsertByKey(..., mergeSchema = true)`):
  * update columns the table lacks evolve the schema (metadata-only
  * add-column commits, old rows read NULL), then the merge lands —
  * on both formats, including Delta CDF/row-tracked tables and
  * Iceberg v3 row-lineage tables. */
class MergeEvolutionSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def base = {
    import spark.implicits._
    (1 to 8).map(i => (i.toLong, s"v$i")).toDF("k", "s")
  }

  // updates: keys 7,8 matched (updated), 9,10 inserted — all carrying
  // a NEW column, deliberately interleaved mid-frame
  private def ups = {
    import spark.implicits._
    (7 to 10).map(i => (i.toLong, s"tag$i", s"V$i")).toDF("k", "tag", "s")
  }

  private def checkMerged(rows: org.apache.spark.sql.DataFrame): Unit = {
    assert(rows.count() == 10L)
    assert(rows.filter(col("tag").isNull).count() == 6L, "old rows read NULL")
    assert(rows.filter(col("k") === 7L).select("s", "tag").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("V7", "tag7")))
    assert(rows.filter(col("k") === 10L).select("tag").collect()
      .head.getString(0) == "tag10")
  }

  test("delta: evolving merge refuses without the flag, lands with it") {
    val path = freshDir("mev_delta")
    DeltaLake.write(base, path)
    assertThrows[IllegalArgumentException](
      DeltaLake.upsertByKey(spark, path, ups, "k"))
    DeltaLake.upsertByKey(spark, path, ups, "k", mergeSchema = true)
    val snap = DeltaLake.snapshot(spark, path)
    assert(snap.schema.fieldNames.toSeq == Seq("k", "s", "tag"),
      "new columns join at the end")
    checkMerged(DeltaLake.read(spark, path))
    // type conflict on a SHARED column refuses before any commit
    import spark.implicits._
    val bad = Seq((1L, 2.5, "x")).toDF("k", "s", "t2")
    val preV = DeltaLake.snapshot(spark, path).version
    assertThrows[IllegalArgumentException](
      DeltaLake.upsertByKey(spark, path, bad, "k", mergeSchema = true))
    assert(DeltaLake.snapshot(spark, path).version == preV,
      "a conflicting evolution must not half-commit")
  }

  test("delta: evolution through CDF and row tracking keeps their contracts") {
    val path = freshDir("mev_delta_rt")
    DeltaLake.write(base, path)
    DeltaLake.enableChangeDataFeed(spark, path)
    DeltaLake.enableRowTracking(spark, path)
    val idsBefore = DeltaLake.readWithRowTracking(spark, path)
      .select("k", "_row_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromV = DeltaLake.snapshot(spark, path).version + 1
    DeltaLake.upsertByKey(spark, path, ups, "k", mergeSchema = true)
    checkMerged(DeltaLake.read(spark, path))
    // matched rows keep their identity through the evolving merge
    val idsAfter = DeltaLake.readWithRowTracking(spark, path)
      .select("k", "_row_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1 to 8).forall(i => idsAfter(i.toLong) == idsBefore(i.toLong)),
      "surviving and updated rows keep their row ids")
    assert(idsAfter.values.toSeq.distinct.size == 10, "fresh ids are unique")
    // the feed carries the new column (pre-images read NULL)
    val feed = DeltaLake.changeFeed(spark, path, fromV)
    val pre7 = feed.filter(col("_change_type") === "update_preimage" && col("k") === 7L)
    assert(pre7.select("tag").collect().head.isNullAt(0))
    val ins = feed.filter(col("_change_type") === "insert")
    assert(ins.count() == 2L && ins.filter(col("tag").isNull).count() == 0L)
  }

  test("iceberg v2: evolving merge, fresh field ids, old rows NULL") {
    val path = freshDir("mev_ice2")
    Iceberg.write(base, path)
    assertThrows[IllegalArgumentException](
      Iceberg.upsertByKey(spark, path, ups, "k"))
    Iceberg.upsertByKey(spark, path, ups, "k", mergeSchema = true)
    checkMerged(Iceberg.read(spark, path))
    // renaming the evolved column is pure metadata (field-id resolution)
    Iceberg.renameColumn(spark, path, "tag", "tag2")
    assert(Iceberg.read(spark, path).filter(col("tag2") === "tag7").count() == 1L)
  }

  test("iceberg v3: evolving merge preserves row lineage on matched rows") {
    val path = freshDir("mev_ice3")
    import spark.implicits._
    // rows 1-4 PREDATE the upgrade (null lineage, stays null); 5-8
    // land after it and carry inherited ids
    Iceberg.write((1 to 4).map(i => (i.toLong, s"v$i")).toDF("k", "s"), path)
    Iceberg.upgradeToV3(spark, path)
    Iceberg.write((5 to 8).map(i => (i.toLong, s"v$i")).toDF("k", "s"), path,
      mode = org.apache.spark.sql.SaveMode.Append)
    def ids() = Iceberg.readWithRowLineage(spark, path)
      .select("k", "_row_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val before = ids()
    assert((5 to 8).forall(i => before(i.toLong).nonEmpty))
    Iceberg.upsertByKey(spark, path, ups, "k", mergeSchema = true)
    checkMerged(Iceberg.read(spark, path))
    val after = ids()
    assert((5 to 8).forall(i => after(i.toLong) == before(i.toLong)),
      "matched single rows inherit their old _row_id through the evolving merge")
    assert((1 to 4).forall(i => after(i.toLong).isEmpty), "null lineage stays null")
    assert(Seq(9L, 10L).forall(k => after(k).nonEmpty), "inserts take fresh ids")
    val real = after.values.flatten.toSeq
    assert(real.distinct.size == real.size)
  }

  test("iceberg: evolving merge rewrites only matched files (v3 lineage path)") {
    // the s61 claim, iceberg side (the timed entry keeps the delta
    // leg): a key-ranged base whose low slice alone matches the merge
    // keeps its unmatched files by identity through the evolution
    val path = freshDir("mev_ice_files")
    import spark.implicits._
    Iceberg.write(
      spark.range(0, 400).select(col("id").as("k"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("v"), col("id")).as("s"))
        .repartitionByRange(4, col("k")), path)
    Iceberg.upgradeToV3(spark, path)
    val pre = Iceberg.files(spark, path).collect().map(_.getString(0)).toSet
    assert(pre.size == 4)
    Iceberg.upsertByKey(spark, path,
      Seq((1L, "m", "upd"), (2L, "m", "upd2")).toDF("k", "tag", "s"),
      "k", mergeSchema = true)
    val post = Iceberg.files(spark, path).collect().map(_.getString(0)).toSet
    assert(post.intersect(pre).size >= 3,
      s"only the matched file may rewrite — ${post.intersect(pre).size} of 4 survived")
    assert(Iceberg.read(spark, path).filter(col("tag").isNotNull).count() == 2L)
    assert(Iceberg.read(spark, path).count() == 400L)
  }

  test("the merge key cannot be evolved in; no-new-columns degenerates cleanly") {
    val path = freshDir("mev_key")
    Iceberg.write(base, path)
    import spark.implicits._
    assertThrows[IllegalArgumentException](
      Iceberg.upsertByKey(spark, path,
        Seq((1L, "x", "y")).toDF("k2", "s", "t"), "k2", mergeSchema = true))
    // mergeSchema=true with NO new columns behaves exactly like false
    Iceberg.upsertByKey(spark, path, Seq((1L, "VV")).toDF("k", "s"), "k",
      mergeSchema = true)
    assert(Iceberg.read(spark, path).filter(col("s") === "VV").count() == 1L)
  }
}
