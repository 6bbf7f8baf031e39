package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, count, input_file_name, lag, sum, when}
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg SORT ORDERS (spec `sort-orders` / `default-sort-order-id` /
  * manifest `sort_order_id`, field 140): declaration is metadata-only,
  * writes honor the order within each staged file and stamp the id,
  * and [[Iceberg.rewriteSorted]] lays the table out with disjoint
  * leading-column ranges that prune at planning. */
class IcebergSortOrderSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def grid(n: Int) = {
    import spark.implicits._
    scala.util.Random.shuffle((1 to n).flatMap(a => (1 to n).map(b => (a.toLong, b.toLong))))
      .toDF("a", "b").repartition(4)
  }

  test("setSortOrder is metadata-only; appends sort within files and stamp the id") {
    val path = freshDir("ice_sort")
    Iceberg.write(grid(20), path)
    val preFiles = Iceberg.files(spark, path).collect().map(_.getString(0)).toSet
    Iceberg.setSortOrder(spark, path, Seq("b desc", "a"))
    assert(Iceberg.sortOrder(path) == Seq(("b", false), ("a", true)))
    // metadata-only: the declaration moved zero data files
    assert(Iceberg.files(spark, path).collect().map(_.getString(0)).toSet == preFiles)

    Iceberg.write(grid(20), path, mode = SaveMode.Append)
    val files = Iceberg.files(spark, path).collect()
    val (pre, post) = files.partition(r => preFiles.contains(r.getString(0)))
    assert(pre.forall(_.isNullAt(5)), "pre-order files carry no sort_order_id")
    assert(post.nonEmpty && post.forall(r => !r.isNullAt(5) && r.getInt(5) == 1),
      "appended files must stamp the declared order id")
    // WITHIN-FILE order: in every appended file, (b desc, a asc) is
    // non-decreasing in encounter order
    val w = Window.partitionBy("__f").orderBy("__pos")
    val violations = spark.read.parquet(post.map(_.getString(0)).toIndexedSeq: _*)
      .withColumn("__f", input_file_name())
      .withColumn("__pos", org.apache.spark.sql.functions.monotonically_increasing_id())
      .withColumn("__pb", lag("b", 1).over(w))
      .withColumn("__pa", lag("a", 1).over(w))
      .filter(col("__pb").isNotNull &&
        (col("b") > col("__pb") || (col("b") === col("__pb") && col("a") < col("__pa"))))
      .count()
    assert(violations == 0L, s"appended files must be sorted (b desc, a): $violations out of order")
  }

  test("sort orders carry forward across appends and schema evolution") {
    val path = freshDir("ice_sort_carry")
    Iceberg.write(grid(8), path)
    Iceberg.setSortOrder(spark, path, Seq("a"))
    Iceberg.write(grid(8), path, mode = SaveMode.Append)
    Iceberg.addColumn(spark, path, "c", org.apache.spark.sql.types.StringType)
    Iceberg.write(grid(8), path, mode = SaveMode.Append, mergeSchema = true)
    assert(Iceberg.sortOrder(path) == Seq(("a", true)),
      "appends and ALTER must not strip the declared sort order")
    // a SECOND declaration mints a fresh id (ids are never reused)
    Iceberg.setSortOrder(spark, path, Seq("b"))
    assert(Iceberg.sortOrder(path) == Seq(("b", true)))
    val (fs, root) = Writers.fsFor(path)
    val ids = {
      val m = java.nio.file.Files.list(Paths.get(path, "metadata")).toArray
        .map(_.toString).filter(_.endsWith(".metadata.json")).sorted.last
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new String(java.nio.file.Files.readAllBytes(Paths.get(m)), "UTF-8"))
      node.get("sort-orders").elements()
    }
    val seen = scala.collection.mutable.ArrayBuffer.empty[Int]
    ids.forEachRemaining(o => seen += o.get("order-id").asInt)
    assert(seen.toSeq == Seq(0, 1, 2), s"order ids accumulate, got $seen")
    // clearSortOrder flips back to unsorted without dropping history
    Iceberg.clearSortOrder(spark, path)
    assert(Iceberg.sortOrder(path).isEmpty)
  }

  test("a schema-replacing Overwrite resets a dangling default order, not the table") {
    import spark.implicits._
    val path = freshDir("ice_sort_dangle")
    Iceberg.write(grid(4), path)
    Iceberg.setSortOrder(spark, path, Seq("b desc"))
    // Overwrite WITHOUT the sort source column: the declared orders
    // stay (ids are forever) but the default resets to 0 — carrying
    // it forward dangling would make this very write's successor
    // throw in sortFieldsOf and leave the table unwritable
    Iceberg.write(Seq((1L, "x"), (2L, "y")).toDF("a", "s"), path,
      mode = SaveMode.Overwrite)
    assert(Iceberg.sortOrder(path).isEmpty, "default order back to 0 (unsorted)")
    // the table keeps working: append, then re-declare a servable order
    Iceberg.write(Seq((3L, "z")).toDF("a", "s"), path, mode = SaveMode.Append)
    assert(Iceberg.read(spark, path).count() == 3L)
    Iceberg.setSortOrder(spark, path, Seq("a"))
    Iceberg.write(Seq((4L, "w")).toDF("a", "s"), path, mode = SaveMode.Append)
    assert(Iceberg.sortOrder(path) == Seq(("a", true)))
    // an Overwrite that KEEPS the source column carries the default
    val path2 = freshDir("ice_sort_keep")
    Iceberg.write(grid(3), path2)
    Iceberg.setSortOrder(spark, path2, Seq("a"))
    Iceberg.write(grid(2), path2, mode = SaveMode.Overwrite)
    assert(Iceberg.sortOrder(path2) == Seq(("a", true)),
      "a same-schema overwrite must not strip the declared default order")
  }

  test("rewriteSorted lays out disjoint ranges: the leading column prunes at planning") {
    val path = freshDir("ice_sort_rewrite")
    Iceberg.write(grid(40), path)
    Iceberg.write(grid(40), path, mode = SaveMode.Append)
    Iceberg.setSortOrder(spark, path, Seq("a", "b"))
    Iceberg.rewriteSorted(spark, path, nFiles = 8)
    val files = Iceberg.files(spark, path).collect()
    assert(files.length == 8 && files.forall(r => !r.isNullAt(5) && r.getInt(5) == 1),
      "the rewrite must stamp every entry with the order id")
    assert(Iceberg.read(spark, path).count() == 3200L)
    val f = Iceberg.read(spark, path).filter(col("a") <= 5L)
    assert(f.count() == 2L * 5 * 40)
    val (kept, total) = org.apache.spark.sql.graft.VersionedFileIndex.lastPlanned(path).get
    assert(kept < total, s"leading-column range must prune at planning ($kept/$total)")
  }

  test("refusals: unknown column, empty order, rewrite without an order") {
    val path = freshDir("ice_sort_refuse")
    Iceberg.write(grid(4), path)
    assertThrows[IllegalArgumentException](
      Iceberg.setSortOrder(spark, path, Seq("nope")))
    assertThrows[IllegalArgumentException](
      Iceberg.setSortOrder(spark, path, Nil))
    assertThrows[IllegalArgumentException](
      Iceberg.rewriteSorted(spark, path))
  }

  test("rewriteSorted folds outstanding merge-on-read delete debt") {
    val path = freshDir("ice_sort_debt")
    Iceberg.write(grid(20), path)
    Iceberg.deleteMergeOnRead(spark, path, col("a") <= 5L)
    Iceberg.setSortOrder(spark, path, Seq("a"))
    Iceberg.rewriteSorted(spark, path, nFiles = 4)
    val s = Iceberg.snapshot(spark, path)
    assert(!s.hasDeleteDebt, "the sorted rewrite must fold delete debt")
    val agg = Iceberg.read(spark, path)
      .agg(count(col("a")).as("n"), sum(when(col("a") <= 5L, 1L).otherwise(0L)).as("low"))
      .collect().head
    assert(agg.getLong(0) == 15L * 20 && agg.getLong(1) == 0L)
  }
}
