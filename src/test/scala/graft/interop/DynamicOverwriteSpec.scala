package graft.interop

import graft.SparkFixture
import graft.ingest.{Versioned, Writers}
import java.nio.file.Paths
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DYNAMIC PARTITION OVERWRITE (the catalog's last standing DML gate,
  * closed r12): `INSERT OVERWRITE` under
  * `spark.sql.sources.partitionOverwriteMode=dynamic` replaces ONLY
  * the partitions the source touches, on all three formats, as ONE
  * atomic commit — untouched partitions' files are carried by
  * reference, require'd by identity. */
class DynamicOverwriteSpec extends AnyFunSuite with SparkFixture {

  private def wh(db: String) =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", "warehouse", db)

  private def dynamic[T](body: => T): T = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try body
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
  }

  test("SQL INSERT OVERWRITE (dynamic) replaces only the touched partition, all three formats") {
    import spark.implicits._
    val whd = wh("dbdyn"); Writers.deleteTree(whd)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dbdyn")
    val base = Seq((1L, "keep-a", "a"), (2L, "old-b", "b"), (3L, "keep-c", "c"))
      .toDF("k", "v", "p")
    DeltaLake.write(base, whd.resolve("td").toString, partitionBy = Seq("p"))
    Iceberg.write(base, whd.resolve("ti").toString, partitionBy = Seq("p"))
    Versioned.commitPartitioned(base, whd.resolve("tg").toString, "p")
    def untouchedFiles(t: String): Set[String] = t match {
      case "td" => DeltaLake.snapshot(spark, whd.resolve("td").toString).files
        .filterNot(_.partitionValues.get("p").flatten.contains("b")).map(_.path).toSet
      case "ti" => Iceberg.snapshot(spark, whd.resolve("ti").toString).files
        .filterNot(_.partitionValues.get("p").flatten.contains("b")).map(_.path).toSet
      case _ =>
        val gp = whd.resolve("tg").toString
        Versioned.manifest(gp, Versioned.currentVersion(gp).get)
          .filterNot(_.partDir.contains("p=b")).map(_.relPath).toSet
    }
    for (t <- Seq("td", "ti", "tg")) {
      val pre = untouchedFiles(t)
      dynamic {
        spark.sql(
          s"INSERT OVERWRITE graft.dbdyn.$t VALUES (20, 'new-b', 'b'), (21, 'new-b2', 'b')")
      }
      spark.sql(s"REFRESH TABLE graft.dbdyn.$t")
      val got = spark.table(s"graft.dbdyn.$t").select("k", "v", "p")
        .as[(Long, String, String)].collect().sortBy(_._1)
      assert(got.toSeq == Seq((1L, "keep-a", "a"), (3L, "keep-c", "c"),
        (20L, "new-b", "b"), (21L, "new-b2", "b")),
        s"$t: partition b must be replaced, a and c untouched: ${got.toSeq}")
      assert(untouchedFiles(t) == pre,
        s"$t: untouched partitions' files must be carried by REFERENCE")
    }
    // static mode is unchanged: a plain INSERT OVERWRITE replaces everything
    spark.sql("INSERT OVERWRITE graft.dbdyn.td VALUES (9, 'only', 'z')")
    spark.sql("REFRESH TABLE graft.dbdyn.td")
    assert(spark.table("graft.dbdyn.td").count() == 1L)
  }

  test("all-new partitions land without touching anything; empty source replaces nothing") {
    import spark.implicits._
    val whd = wh("dbdyn2"); Writers.deleteTree(whd)
    val ip = whd.resolve("ti2").toString
    Iceberg.write(Seq((1L, "a", "a")).toDF("k", "v", "p"), ip, partitionBy = Seq("p"))
    val pre = Iceberg.snapshot(spark, ip).files.map(_.path).toSet
    Iceberg.replacePartitions(spark, ip, Seq((2L, "d", "d")).toDF("k", "v", "p"))
    assert(Iceberg.read(spark, ip).count() == 2)
    assert(pre.subsetOf(Iceberg.snapshot(spark, ip).files.map(_.path).toSet))
    val v = Iceberg.snapshot(spark, ip).snapshotId
    assert(Iceberg.replacePartitions(spark, ip,
      Seq.empty[(Long, String, String)].toDF("k", "v", "p")) == v,
      "an empty source must be a no-op, not a commit")
    val dp = whd.resolve("td2").toString
    DeltaLake.write(Seq((1L, "a", "a")).toDF("k", "v", "p"), dp, partitionBy = Seq("p"))
    val dv = DeltaLake.snapshot(spark, dp).version
    assert(DeltaLake.replacePartitions(spark, dp,
      Seq.empty[(Long, String, String)].toDF("k", "v", "p")) == dv)
  }

  test("gates: unpartitioned/transform layouts and unstable partition types refuse") {
    import spark.implicits._
    val whd = wh("dbdyn3"); Writers.deleteTree(whd)
    val dp = whd.resolve("flat").toString
    DeltaLake.write(Seq((1L, "a")).toDF("k", "v"), dp)
    val e1 = intercept[IllegalArgumentException](
      DeltaLake.replacePartitions(spark, dp, Seq((2L, "b")).toDF("k", "v")))
    assert(e1.getMessage.contains("unpartitioned"), e1.getMessage)
    val ip = whd.resolve("bucketed").toString
    Iceberg.write(Seq((1L, "a")).toDF("k", "v"), ip, partitionBy = Seq("bucket(4, k)"))
    val e2 = intercept[IllegalArgumentException](
      Iceberg.replacePartitions(spark, ip, Seq((2L, "b")).toDF("k", "v")))
    assert(e2.getMessage.contains("identity"), e2.getMessage)
    val tp = whd.resolve("tspart").toString
    val tdf = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("k", "ts")
    DeltaLake.write(tdf, tp, partitionBy = Seq("ts"))
    val e3 = intercept[IllegalArgumentException](
      DeltaLake.replacePartitions(spark, tp, tdf))
    assert(e3.getMessage.contains("canonical string"), e3.getMessage)
  }

  test("CDF-enabled Delta table records delete+insert images scoped to the touched partition") {
    import spark.implicits._
    val whd = wh("dbdyn4"); Writers.deleteTree(whd)
    val dp = whd.resolve("cdf").toString
    DeltaLake.write(Seq((1L, "a", "a"), (2L, "b", "b")).toDF("k", "v", "p"),
      dp, partitionBy = Seq("p"))
    DeltaLake.enableChangeDataFeed(spark, dp)
    val v = DeltaLake.replacePartitions(spark, dp,
      Seq((20L, "b2", "b")).toDF("k", "v", "p"))
    val feed = spark.read.format("delta").option("readChangeFeed", "true")
      .option("startingVersion", v.toString).load(dp)
      .select("k", "_change_type").as[(Long, String)].collect().sortBy(_._1)
    assert(feed.toSeq == Seq((2L, "delete"), (20L, "insert")),
      s"the feed must carry exactly the touched partition's images: ${feed.toSeq}")
    // row-tracked tables replace with FRESH identities
    DeltaLake.enableRowTracking(spark, dp)
    DeltaLake.replacePartitions(spark, dp, Seq((30L, "b3", "b")).toDF("k", "v", "p"))
    val ids = DeltaLake.readWithRowTracking(spark, dp)
      .select("_row_id").as[Long].collect().toSeq
    assert(ids.distinct.size == ids.size, s"fresh ids must not collide: $ids")
  }
}
