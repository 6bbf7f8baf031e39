package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Partition-scoped compaction (`OPTIMIZE ... WHERE`): only the
  * matching partition's files rewrite; everything else — out-of-scope
  * small files AND out-of-scope merge-on-read delete debt — stays
  * exactly as it was and keeps applying. */
class CompactWhereSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def frame = {
    import spark.implicits._
    (1 to 24).map(i => (i.toLong, i % 2, s"v$i")).toDF("k", "grp", "s")
      .repartition(4) // several small files per partition
  }

  test("delta: scoped OPTIMIZE compacts only the matching partition") {
    val path = freshDir("cw_delta")
    DeltaLake.write(frame, path, partitionBy = Seq("grp"))
    def filesOf(g: String) = DeltaLake.snapshot(spark, path).files
      .filter(_.partitionValues.get("grp").exists(_.contains(g)))
    val (pre0, pre1) = (filesOf("0").map(_.path).toSet, filesOf("1").map(_.path).toSet)
    assert(pre0.size > 1 && pre1.size > 1)
    DeltaLake.compact(spark, path, partitionFilter = Map("grp" -> "0"))
    assert(filesOf("0").size == 1, "the matching partition bin-packs")
    assert(filesOf("1").map(_.path).toSet == pre1, "out-of-scope files untouched")
    assert(DeltaLake.read(spark, path).count() == 24L)
    assertThrows[IllegalArgumentException](
      DeltaLake.compact(spark, path, partitionFilter = Map("nope" -> "0")))
  }

  test("iceberg: scoped compact leaves out-of-scope delete debt applied") {
    val path = freshDir("cw_ice")
    Iceberg.write(frame, path, partitionBy = Seq("grp"))
    // merge-on-read delete debt in grp=1 only
    Iceberg.deleteMergeOnRead(spark, path, col("grp") === 1 && col("k") <= 8L)
    val expected = 24L - 4L // k in {1,3,5,7} deleted
    assert(Iceberg.read(spark, path).count() == expected)
    def filesOf(g: String) = Iceberg.snapshot(spark, path).files
      .filter(_.partitionValues.get("grp").exists(_.contains(g)))
    val pre1 = filesOf("1").map(_.path).toSet
    // scoped to grp=0: grp1 and its debt must survive, still applied
    Iceberg.compact(spark, path, partitionFilter = Map("grp" -> "0"))
    assert(filesOf("0").size == 1)
    assert(filesOf("1").map(_.path).toSet == pre1, "out-of-scope files untouched")
    assert(Iceberg.snapshot(spark, path).hasDeleteDebt,
      "a scoped compact must not fold out-of-scope delete debt")
    assert(Iceberg.read(spark, path).count() == expected,
      "the surviving debt keeps applying")
    // a whole-table compact then folds everything
    Iceberg.compact(spark, path)
    assert(!Iceberg.snapshot(spark, path).hasDeleteDebt)
    assert(Iceberg.read(spark, path).count() == expected)
    assertThrows[IllegalArgumentException](
      Iceberg.compact(spark, path, partitionFilter = Map("s" -> "x")))
  }
}
