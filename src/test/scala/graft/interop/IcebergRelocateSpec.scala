package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** [[IcebergRelocate]] — the `rewrite_table_path` DR shape: a relocated
  * tree must be a fully SELF-CONTAINED table (no metadata string still
  * pointing into the source root), read bit-equal, and diverge
  * independently of its source. */
class IcebergRelocateSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  /** Every metadata byte-stream mention of `root` — the shared
    * self-containment probe ([[IcebergRelocate.mentions]]). */
  private def metaMentions(tableRoot: String, needle: String): Long =
    IcebergRelocate.mentions(Paths.get(tableRoot, "metadata"), needle)

  test("relocated multi-commit table is self-contained, reads bit-equal, diverges independently") {
    val src = freshDir("reloc_src")
    val dst = freshDir("reloc_dst")
    java.nio.file.Files.deleteIfExists(Paths.get(dst))
    val base = spark.range(0, 3000).select(col("id").as("k"), (col("id") % 7).as("v"))
    Iceberg.write(base.filter(col("k") < 2000), src)
    Iceberg.write(base.filter(col("k") >= 2000), src, mode = SaveMode.Append)
    IcebergRelocate.relocate(src, dst)
    // self-containment: not one metadata file in the clone mentions the
    // source root (manifest_path, file_path, location, metadata-log)
    assert(metaMentions(dst, src) == 0,
      "relocated metadata must not reference the source root")
    assert(metaMentions(dst, dst) > 0, "sanity: the clone references its own root")
    // bit-equal read
    val a = Iceberg.read(spark, src).orderBy("k").collect()
    val b = Iceberg.read(spark, dst).orderBy("k").collect()
    assert(a.sameElements(b), "relocated table must read identically")
    // divergence: a commit on the clone never touches the source
    val srcSnaps = Iceberg.snapshots(src).size
    Iceberg.write(base.limit(5).withColumn("v", col("v") + 100), dst, mode = SaveMode.Append)
    assert(Iceberg.snapshots(src).size == srcSnaps, "source must not see clone commits")
    assert(Iceberg.read(spark, dst).count() == 3005L)
    assert(Iceberg.read(spark, src).count() == 3000L)
  }

  test("relocating a DV-debted v3 table keeps deleted rows deleted (pointer + bounds rewrite)") {
    val src = freshDir("reloc_dv_src")
    val dst = freshDir("reloc_dv_dst")
    java.nio.file.Files.deleteIfExists(Paths.get(dst))
    Iceberg.write(
      spark.range(0, 2000).select(col("id").as("k"), (col("id") % 5).as("v"))
        .repartitionByRange(2, col("k")),
      src)
    Iceberg.upgradeToV3(spark, src)
    Iceberg.deleteMergeOnRead(spark, src, col("k") < 500L)
    assert(Iceberg.read(spark, src).count() == 1500L)
    IcebergRelocate.relocate(src, dst)
    assert(metaMentions(dst, src) == 0,
      "DV manifest entries (path + referenced_data_file) must re-root")
    // the deleted rows must STAY deleted through the relocated DV
    // pointers — a stale referenced_data_file or wrongly-vetoing path
    // bound would resurrect them
    assert(Iceberg.read(spark, dst).count() == 1500L,
      "deletes must survive relocation")
    assert(Iceberg.read(spark, dst).filter(col("k") < 500L).count() == 0L)
  }

  test("refuses to relocate parquet-stored position-delete debt") {
    val src = freshDir("reloc_refuse_src")
    val dst = freshDir("reloc_refuse_dst")
    java.nio.file.Files.deleteIfExists(Paths.get(dst))
    Iceberg.write(
      spark.range(0, 1000).select(col("id").as("k"), col("id").as("v")), src)
    // v2 table: deleteMergeOnRead lands a position-delete PARQUET whose
    // file_path COLUMN (inside the payload) cannot be rewritten
    Iceberg.deleteMergeOnRead(spark, src, col("k") < 100L)
    val e = intercept[IllegalStateException](IcebergRelocate.relocate(src, dst))
    assert(e.getMessage.contains("delete file stored as parquet"))
  }

  test("statistics (Puffin) and refs survive relocation and serve from the new root") {
    val src = freshDir("reloc_stats_src")
    val dst = freshDir("reloc_stats_dst")
    java.nio.file.Files.deleteIfExists(Paths.get(dst))
    Iceberg.write(
      spark.range(0, 1000).select(col("id").as("k"), (col("id") % 10).as("v")), src)
    // Puffin ndv blobs + the metadata `statistics` entry (absolute
    // statistics-path) + a named ref — the richer metadata surfaces
    // whose self-references must re-root too
    Iceberg.analyzeTable(spark, src)
    Iceberg.createRef(spark, src, "audit", Iceberg.snapshot(spark, src).snapshotId, "tag")
    IcebergRelocate.relocate(src, dst)
    assert(metaMentions(dst, src) == 0,
      "statistics-path and every other self-reference must re-root")
    // the relocated statistics still serve (ndv from the copied blob)
    val ndv = Iceberg.readTableStatistics(spark, dst)
    assert(ndv.get("k").exists(n => n > 900 && n <= 1100),
      s"relocated Puffin ndv must still serve: $ndv")
    assert(Iceberg.refs(dst).contains("audit"), "refs ride metadata — must survive")
  }

  test("refuses a non-table source and an existing destination") {
    val notATable = freshDir("reloc_not_table")
    java.nio.file.Files.createDirectories(Paths.get(notATable))
    intercept[IllegalArgumentException](
      IcebergRelocate.relocate(notATable, freshDir("reloc_x")))
    val src = freshDir("reloc_exists_src")
    Iceberg.write(spark.range(3).select(col("id").as("k")), src)
    val dst = freshDir("reloc_exists_dst")
    java.nio.file.Files.createDirectories(Paths.get(dst))
    intercept[IllegalArgumentException](IcebergRelocate.relocate(src, dst))
  }
}
