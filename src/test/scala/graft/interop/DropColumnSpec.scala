package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** DROP COLUMN: metadata-only on both formats, with the id-reuse guard
  * as the headline claim — re-adding the dropped NAME mints a fresh
  * identity (mapping id / field id) that reads NULL from every old
  * file; the dropped data can never resurrect. */
class DropColumnSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def frame = {
    import spark.implicits._
    (1 to 6).map(i => (i.toLong, i * 10L, s"v$i")).toDF("k", "junk", "s")
      .repartition(2) // two files, so compact() always has a fold group
  }

  test("delta: drop is metadata-only; a re-added name reads NULL; time travel still serves it") {
    val path = freshDir("drop_delta")
    DeltaLake.write(frame, path, columnMapping = Some("name"))
    val preFiles = DeltaLake.snapshot(spark, path).files.map(_.path).toSet
    val vDrop = DeltaLake.dropColumn(spark, path, "junk")
    val snap = DeltaLake.snapshot(spark, path)
    assert(snap.schema.fieldNames.toSeq == Seq("k", "s"))
    assert(snap.files.map(_.path).toSet == preFiles, "zero files touched")
    // the protocol's id-reuse guard: same name, fresh physical identity
    DeltaLake.addColumn(spark, path, "junk", LongType)
    val rows = DeltaLake.read(spark, path)
    assert(rows.count() == 6L && rows.filter(col("junk").isNotNull).count() == 0L,
      "re-added name must read NULL everywhere, not resurrect dropped data")
    // time travel BEFORE the drop still serves the original values
    val old = DeltaLake.read(spark, path, versionAsOf = Some(vDrop - 1))
    assert(old.filter(col("junk") === 30L).count() == 1L)
  }

  test("delta: refusals — unmapped table, partition column, constraint/generation refs") {
    val path = freshDir("drop_delta_refuse")
    DeltaLake.write(frame, path)
    assertThrows[IllegalArgumentException](DeltaLake.dropColumn(spark, path, "junk"))
    val mapped = freshDir("drop_delta_refuse2")
    DeltaLake.write(frame, mapped, partitionBy = Seq("s"), columnMapping = Some("name"))
    assertThrows[IllegalArgumentException](DeltaLake.dropColumn(spark, mapped, "s"))
    assertThrows[IllegalArgumentException](DeltaLake.dropColumn(spark, mapped, "nope"))
    DeltaLake.addCheckConstraint(spark, mapped, "junk_pos", "junk >= 0")
    assertThrows[IllegalArgumentException](DeltaLake.dropColumn(spark, mapped, "junk"))
  }

  test("iceberg: drop is metadata-only; a re-added name reads NULL by field-id resolution") {
    val path = freshDir("drop_ice")
    Iceberg.write(frame, path)
    val preFiles = Iceberg.files(spark, path).collect().map(_.getString(0)).toSet
    Iceberg.dropColumn(spark, path, "junk")
    assert(Iceberg.read(spark, path).columns.toSeq == Seq("k", "s"))
    assert(Iceberg.files(spark, path).collect().map(_.getString(0)).toSet == preFiles)
    Iceberg.addColumn(spark, path, "junk", LongType)
    val rows = Iceberg.read(spark, path)
    assert(rows.count() == 6L && rows.filter(col("junk").isNotNull).count() == 0L,
      "fresh field id must not bind the old files' column")
    // writes STILL work after the drop-and-readd dance
    import spark.implicits._
    Iceberg.write(Seq((7L, "v7", 70L)).toDF("k", "s", "junk"), path,
      mode = org.apache.spark.sql.SaveMode.Append)
    assert(Iceberg.read(spark, path).filter(col("junk") === 70L).count() == 1L)
  }

  test("iceberg: refusals — partition source, sort-order source, equality-delete debt, last column") {
    val path = freshDir("drop_ice_refuse")
    Iceberg.write(frame, path, partitionBy = Seq("s"))
    assertThrows[IllegalArgumentException](Iceberg.dropColumn(spark, path, "s"))
    val sorted = freshDir("drop_ice_refuse2")
    Iceberg.write(frame, sorted)
    Iceberg.setSortOrder(spark, sorted, Seq("junk"))
    assertThrows[IllegalArgumentException](Iceberg.dropColumn(spark, sorted, "junk"))
    Iceberg.clearSortOrder(spark, sorted)
    // equality-delete debt naming the column blocks the drop
    Iceberg.deleteEquality(spark, sorted,
      { import spark.implicits._; Seq(Tuple1(20L)).toDF("junk") })
    assertThrows[IllegalArgumentException](Iceberg.dropColumn(spark, sorted, "junk"))
    Iceberg.compact(spark, sorted)
    Iceberg.dropColumn(spark, sorted, "junk") // debt folded, drop lands
    assert(Iceberg.read(spark, sorted).columns.toSeq == Seq("k", "s"))
    assert(Iceberg.read(spark, sorted).count() == 5L, "the equality delete applied")
    Iceberg.dropColumn(spark, sorted, "k")
    assertThrows[IllegalArgumentException](
      Iceberg.dropColumn(spark, sorted, "s")) // last column
  }

  test("SQL: ALTER TABLE DROP COLUMN through the graft catalog on both formats") {
    import spark.implicits._
    val whd = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_test", "warehouse", "dbdrop")
    Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbdrop")
    DeltaLake.write(frame, whd.resolve("td").toString, columnMapping = Some("name"))
    spark.sql("ALTER TABLE graft.dbdrop.td DROP COLUMN junk")
    assert(spark.table("graft.dbdrop.td").columns.toSeq == Seq("k", "s"))
    Iceberg.write(frame, whd.resolve("ti").toString)
    spark.sql("ALTER TABLE graft.dbdrop.ti DROP COLUMN junk")
    assert(spark.table("graft.dbdrop.ti").columns.toSeq == Seq("k", "s"))
  }
}
