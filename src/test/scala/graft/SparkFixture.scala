package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** Shared local SparkSession for specs — one JVM-wide session (getOrCreate)
  * so the suite pays startup once. UTC + tiny shuffle fan-out mirror the
  * driver's Verify config. */
trait SparkFixture extends BeforeAndAfterAll { self: Suite =>
  lazy val spark: SparkSession = SparkFixture.session

  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}

object SparkFixture {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.fieldId.read.enabled", "true")
    .config("spark.sql.parquet.fieldId.write.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftSparkExtensions")
    .config("spark.sql.catalog.graft", "org.apache.spark.sql.graft.GraftCatalog")
    .config("spark.sql.catalog.graft.warehouse",
      java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
        "graft_test", "warehouse").toString)
    .getOrCreate()
}
