package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** REWRITE MANIFESTS (r10 verdict "missing #2"): bin-packing small
  * data manifests is a pure-metadata `replace` — data files untouched,
  * content identical, deletes still applying, v3 row lineage stable —
  * and a no-op (no commit) when nothing can merge. */
class RewriteManifestsSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def dataManifests(path: String): Long =
    Iceberg.manifestsTable(spark, path).filter(col("content") === "data").count()

  test("bin-packs small manifests metadata-only; carries pre-rewrite history") {
    import spark.implicits._
    val path = freshDir("rwm_basic")
    // 6 appends -> 6 one-file data manifests in the head snapshot
    (0 until 6).foreach { i =>
      Iceberg.write(Seq((i.toLong, s"r$i")).toDF("k", "v"), path,
        mode = if (i == 0) SaveMode.Overwrite else SaveMode.Append)
    }
    assert(dataManifests(path) == 6L)
    val preFiles = Iceberg.files(spark, path).collect().map(_.getString(0)).toSet
    val preSnaps = Iceberg.snapshots(path).size
    val (before, after) = Iceberg.rewriteManifests(spark, path)
    assert(before == 6 && after == 1, s"expected 6 -> 1, got $before -> $after")
    assert(dataManifests(path) == 1L)
    // the inspection table's merged record: 0 added, 6 existing
    val row = Iceberg.manifestsTable(spark, path)
      .filter(col("content") === "data").collect().head
    assert(row.getLong(5) == 0L && row.getLong(6) == 6L,
      "merged manifest records 0 added / 6 existing files")
    // pure metadata: same files, same content
    assert(Iceberg.files(spark, path).collect().map(_.getString(0)).toSet == preFiles)
    assert(Iceberg.read(spark, path).as[(Long, String)].collect().sortBy(_._1).toSeq ==
      (0 until 6).map(i => (i.toLong, s"r$i")))
    // one replace commit; time travel to the pre-rewrite snapshot works
    assert(Iceberg.snapshots(path).size == preSnaps + 1)
    val prevId = Iceberg.snapshots(path).dropRight(1).last._1
    assert(Iceberg.read(spark, path, snapshotId = Some(prevId)).count() == 6L)
  }

  test("no-op (no commit) when nothing can merge; target size respected") {
    import spark.implicits._
    val path = freshDir("rwm_noop")
    Iceberg.write(Seq((1L, "a")).toDF("k", "v"), path)
    val preSnaps = Iceberg.snapshots(path).size
    assert(Iceberg.rewriteManifests(spark, path) == (1, 1))
    // a target below every manifest's size classifies them all as big
    Iceberg.write(Seq((2L, "b")).toDF("k", "v"), path, mode = SaveMode.Append)
    assert(Iceberg.rewriteManifests(spark, path, targetSizeBytes = Some(1L)) == (2, 2))
    assert(Iceberg.snapshots(path).size == preSnaps + 1, "no rewrite commits")
  }

  test("MoR deletes keep applying: delete manifests carry, entry seqs stay explicit") {
    val path = freshDir("rwm_mor")
    Iceberg.write(spark.range(0, 300).select(col("id").as("k"), col("id").as("v"))
      .repartitionByRange(3, col("k")), path)
    (0 until 3).foreach { i =>
      Iceberg.write(spark.range(1000L + i, 1001L + i)
        .select(col("id").as("k"), col("id").as("v")), path, mode = SaveMode.Append)
    }
    Iceberg.deleteMergeOnRead(spark, path, col("k") < 100L)
    val preCount = Iceberg.read(spark, path).count()
    val (before, after) = Iceberg.rewriteManifests(spark, path)
    assert(after < before, s"manifests must shrink ($before -> $after)")
    assert(Iceberg.manifestsTable(spark, path)
      .filter(col("content") === "deletes").count() >= 1L,
      "delete manifests carry by reference")
    assert(Iceberg.read(spark, path).count() == preCount)
    assert(Iceberg.read(spark, path).filter(col("k") < 100L).count() == 0L,
      "the position deletes must still apply after the manifest rewrite")
  }

  test("v3: row lineage is identical across the rewrite (explicit first_row_id)") {
    import spark.implicits._
    val path = freshDir("rwm_lineage")
    Iceberg.write(Seq((1L, "a")).toDF("k", "v"), path)
    Iceberg.upgradeToV3(spark, path)
    (2 to 5).foreach(i =>
      Iceberg.write(Seq((i.toLong, s"r$i")).toDF("k", "v"), path, mode = SaveMode.Append))
    def lineage: Map[Long, Any] = Iceberg.readWithRowLineage(spark, path)
      .select(col("k"), col("_row_id")).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    val pre = lineage
    val (before, after) = Iceberg.rewriteManifests(spark, path)
    assert(after < before)
    assert(lineage == pre,
      "merged manifests must materialize inherited first_row_id explicitly")
  }
}
