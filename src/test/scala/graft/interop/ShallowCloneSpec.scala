package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** SHALLOW CLONE (r13): one v0 commit whose adds reference the source
  * snapshot's files by ABSOLUTE path — zero data bytes at any scale.
  * The clone carries the source's full definition (protocol, schema
  * with declarations, configuration, domainMetadata) and then diverges
  * independently; `u`-storage deletion vectors re-address as `p`
  * absolutes (a `u` resolves against the TABLE root, which changed). */
class ShallowCloneSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def dataFileCount(p: String): Int = {
    val st = java.nio.file.Files.walk(Paths.get(p))
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.count(f =>
        f.toString.endsWith(".parquet") && !f.toString.contains("_delta_log"))
    } finally st.close()
  }

  test("clone reads the source snapshot with zero data files; both diverge after") {
    import spark.implicits._
    val src = freshDir("clone_src"); val dst = freshDir("clone_dst")
    val base = (1 to 6000).map(i => (i.toLong, s"g${i % 4}"))
    DeltaLake.write(base.toDF("k", "grp"), src, partitionBy = Seq("grp"))
    // a DENSE delete: per-file bitmaps exceed the 512-byte inline
    // bound and land as p-storage blobs (this writer's large-DV shape
    // is already an ABSOLUTE p path — clone-safe verbatim; the clone's
    // u→p re-address branch serves FOREIGN tables, whose u descriptors
    // resolve against the table root that a clone changes)
    DeltaLake.deleteMergeOnRead(spark, src, col("k") % 3 === 0)
    val survivors = base.filterNot(_._1 % 3 == 0)
    val srcDv = DeltaLake.snapshot(spark, src).files.flatMap(_.dv)
    assert(srcDv.exists(_.storageType == "p"),
      s"test setup: expected p-storage DVs, got ${srcDv.map(_.storageType).distinct}")
    DeltaLake.shallowClone(spark, src, dst)
    assert(dataFileCount(dst) == 0, "a shallow clone writes ZERO data files")
    assert(DeltaLake.read(spark, dst).count() == survivors.size.toLong,
      "the clone serves the source snapshot, deletion vectors applied")
    val cloneDv = DeltaLake.snapshot(spark, dst).files.flatMap(_.dv)
    assert(cloneDv.exists(_.storageType == "p") &&
      cloneDv.forall(d => d.storageType == "p" || d.storageType == "i"),
      "u-storage DVs must re-address as absolute p descriptors " +
        s"(inline ones travel in the log): ${cloneDv.map(_.storageType).distinct}")
    // the clone keeps the partition layout and prunes on it
    assert(DeltaLake.snapshot(spark, dst).partitionColumns == Seq("grp"))
    assert(DeltaLake.read(spark, dst).filter(col("grp") === "g1").count() ==
      survivors.count(_._2 == "g1").toLong)
    // divergence: writes on either side never touch the other
    DeltaLake.write(Seq((9100L, "g9")).toDF("k", "grp"), dst, mode = SaveMode.Append)
    DeltaLake.deleteWhere(spark, dst, col("k") <= 400L)
    assert(DeltaLake.read(spark, src).count() == survivors.size.toLong,
      "mutating the clone must not change the source")
    DeltaLake.write(Seq((9200L, "g8")).toDF("k", "grp"), src, mode = SaveMode.Append)
    val cloneCount = survivors.count(_._1 > 400L).toLong + 1L
    assert(DeltaLake.read(spark, dst).count() == cloneCount,
      "mutating the source must not change the clone")
    // compaction on the clone rewrites into its OWN root — after it
    // the clone is self-contained and the absolute references are gone
    DeltaLake.compact(spark, dst)
    assert(DeltaLake.snapshot(spark, dst).files.forall(!_.path.startsWith("/")),
      "compaction must land relative files under the clone's root")
    assert(DeltaLake.read(spark, dst).count() == cloneCount)
    // vacuum on the clone walks only its root: the source's files survive
    val srcFiles = dataFileCount(src)
    DeltaLake.vacuum(spark, dst)
    assert(dataFileCount(src) == srcFiles,
      "the clone's vacuum must never reclaim the source's files")
    assert(DeltaLake.read(spark, src).count() == survivors.size.toLong + 1L)
  }

  test("clone carries declarations and domains; CALL clone works; refusals loud") {
    import spark.implicits._
    val whd = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test",
      "warehouse", "dbcl")
    Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbcl")
    spark.sql("""CREATE TABLE graft.dbcl.src (
      id BIGINT GENERATED ALWAYS AS IDENTITY, v STRING) USING delta""")
    val sp = whd.resolve("src").toString
    DeltaLake.write(Seq("a", "b").toDF("v"), sp, mode = SaveMode.Append)
    DeltaLake.analyzeTable(spark, sp) // a domainMetadata artifact to carry
    spark.sql("CALL graft.system.clone('dbcl.src', target => 'dbcl.dev')").collect()
    val dp = whd.resolve("dev").toString
    assert(spark.table("graft.dbcl.dev").count() == 2L,
      "the cloned table is instantly name-addressable")
    // the identity declaration AND watermark rode the cloned schema:
    // generation on the clone resumes past the source's watermark
    assert(DeltaLake.identityColumns(spark, dp)("id")._2.contains(2L))
    DeltaLake.write(Seq("c").toDF("v"), dp, mode = SaveMode.Append)
    assert(DeltaLake.read(spark, dp).filter(col("v") === "c")
      .select("id").as[Long].head() == 3L)
    // the statistics domain rode too
    assert(DeltaLake.readTableStatistics(spark, dp).nonEmpty)
    // refusals: existing target, same path, non-delta source
    val e1 = intercept[Exception](spark.sql(
      "CALL graft.system.clone('dbcl.src', target => 'dbcl.dev')").collect())
    assert(e1.getMessage.contains("already has a Delta log"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      DeltaLake.shallowClone(spark, sp, sp))
    assert(e2.getMessage.contains("same table"), e2.getMessage)
    spark.sql("CREATE TABLE graft.dbcl.gi (k BIGINT) USING iceberg")
    val e3 = intercept[Exception](spark.sql(
      "CALL graft.system.clone('dbcl.gi', target => 'dbcl.gi2')").collect())
    assert(e3.getMessage.contains("zero-copy"), e3.getMessage)
  }
}
