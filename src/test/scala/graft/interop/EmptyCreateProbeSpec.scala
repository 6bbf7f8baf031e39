package graft.interop

import graft.SparkFixture
import graft.ingest.{Versioned, Writers}
import java.nio.file.Paths
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Empirical contract for zero-row table creation — what the V2
  * catalog's CREATE TABLE stands on. Each format must round-trip an
  * EMPTY frame into a readable empty table whose schema (and layout)
  * survive, and accept a later append. */
class EmptyCreateProbeSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType), StructField("grp", LongType)))

  private def emptyDf = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  test("graft-versioned: empty commit reads back empty with schema; append works") {
    import spark.implicits._
    val p = freshDir("empty_graft")
    Versioned.commit(emptyDf, p)
    val got = Versioned.read(spark, p)
    assert(got.count() == 0L && got.columns.toSeq == Seq("k", "v", "grp"))
    Versioned.appendCommit(Seq((1L, "a", 0L)).toDF("k", "v", "grp"), p)
    assert(Versioned.read(spark, p).count() == 1L)
  }

  test("delta: empty write reads back empty with schema; append works") {
    import spark.implicits._
    val p = freshDir("empty_delta")
    DeltaLake.write(emptyDf, p, partitionBy = Seq("grp"))
    val got = DeltaLake.read(spark, p)
    assert(got.count() == 0L && got.columns.toSeq == Seq("k", "v", "grp"))
    DeltaLake.write(Seq((1L, "a", 0L)).toDF("k", "v", "grp"), p, mode = SaveMode.Append)
    assert(DeltaLake.read(spark, p).count() == 1L)
    assert(DeltaLake.snapshot(spark, p).partitionColumns == Seq("grp"))
  }

  test("iceberg: empty write reads back empty with schema; append works") {
    import spark.implicits._
    val p = freshDir("empty_iceberg")
    Iceberg.write(emptyDf, p, partitionBy = Seq("grp"))
    val got = Iceberg.read(spark, p)
    assert(got.count() == 0L && got.columns.toSeq == Seq("k", "v", "grp"))
    Iceberg.write(Seq((1L, "a", 0L)).toDF("k", "v", "grp"), p, mode = SaveMode.Append)
    assert(Iceberg.read(spark, p).count() == 1L)
  }
}
