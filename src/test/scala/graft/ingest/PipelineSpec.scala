package graft.ingest

import graft.SparkFixture
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite with SparkFixture {

  private def writeCsv(dir: String, name: String, lines: Seq[String]): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    Files.write(d.resolve(name), String.join("\n", lines: _*).getBytes("UTF-8"))
  }

  test("loadTable: csv -> sanitized, coerced, queryable catalog table") {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", "pipeline_csv").toString
    writeCsv(dir, "part1.csv", Seq(
      "Order ID!,Order Date,Region Name",
      "1,2024-01-02,east",
      "2,2024-02-03,west",
    ))
    val df = Pipeline.loadTable(spark, dir, "Graft Pipeline Orders", overwrite = true)
    try {
      assert(df.columns.toSeq == Seq("order_id", "order_date", "region_name"))
      val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
      // Spark's CSV inferSchema types small ints as integer; bestFit only
      // widens columns the reader left as string
      assert(types("order_id") == "integer")
      assert(types("order_date") == "date")
      assert(types("region_name") == "string")
      assert(spark.table("graft_pipeline_orders").count() == 2)
      // second load without overwrite appends
      Pipeline.loadTable(spark, dir, "Graft Pipeline Orders")
      assert(spark.table("graft_pipeline_orders").count() == 4)
    } finally spark.sql("DROP TABLE IF EXISTS graft_pipeline_orders")
  }

  test("loadTable with a bad partition column fails BEFORE dropping the existing table") {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", "pipeline_safe").toString
    writeCsv(dir, "p.csv", Seq("id,v", "1,a", "2,b"))
    Pipeline.loadTable(spark, dir, "graft_pipeline_safe", overwrite = true)
    try {
      assert(spark.table("graft_pipeline_safe").count() == 2)
      intercept[IllegalArgumentException] {
        Pipeline.loadTable(spark, dir, "graft_pipeline_safe",
          partitionBy = Seq("not_a_column"), overwrite = true)
      }
      // the failed overwrite must not have destroyed the table or its data
      assert(spark.table("graft_pipeline_safe").count() == 2)
    } finally spark.sql("DROP TABLE IF EXISTS graft_pipeline_safe")
  }

  test("loadInto overwrite on an EXTERNAL table drops the table but preserves its data dir") {
    import spark.implicits._
    val extDir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", "pipeline_external")
    Writers.deleteTree(extDir)
    Seq((1L, "keep-me"), (2L, "keep-me-too")).toDF("id", "v")
      .write.parquet(extDir.toString)
    spark.sql(s"CREATE TABLE graft_pipeline_ext USING PARQUET LOCATION '${extDir}'")
    try {
      assert(spark.table("graft_pipeline_ext").count() == 2)
      Pipeline.loadInto(spark, "graft_pipeline_ext",
        Seq((9L, "new")).toDF("id", "v"), overwrite = true)
      // the replacement (managed) table holds only the new rows...
      assert(spark.table("graft_pipeline_ext").collect().map(_.getLong(0)).toSeq == Seq(9L))
      // ...and the ORIGINAL external directory still holds the user's data
      // (DROP TABLE on EXTERNAL preserves it; so must a library overwrite)
      assert(spark.read.parquet(extDir.toString).count() == 2,
        "external data directory was destroyed by overwrite")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_pipeline_ext")
      Writers.deleteTree(extDir)
    }
  }

  test("loadInto overwrite refuses an EXTERNAL table parked at its default managed path") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_pipeline_extdef")
    val defPath = Paths.get(spark.sessionState.catalog
      .defaultTablePath(org.apache.spark.sql.catalyst.TableIdentifier("graft_pipeline_extdef")).getPath)
    Writers.deleteTree(defPath)
    Seq((1L, "keep")).toDF("id", "v").write.parquet(defPath.toString)
    spark.sql(s"CREATE TABLE graft_pipeline_extdef USING PARQUET LOCATION '$defPath'")
    try {
      // DROP must preserve the files (external), but a recreated managed
      // table at the SAME path would silently re-read them next to the new
      // batch — loadInto must fail loudly instead of returning old+new
      val err = intercept[IllegalArgumentException] {
        Pipeline.loadInto(spark, "graft_pipeline_extdef",
          Seq((9L, "new")).toDF("id", "v"), overwrite = true)
      }
      assert(err.getMessage.contains("default"), s"wrong diagnosis: ${err.getMessage}")
      // nothing destroyed: table still queryable, data intact
      assert(spark.table("graft_pipeline_extdef").count() == 1)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_pipeline_extdef")
      Writers.deleteTree(defPath)
    }
  }

  test("a batch that both adds a column and omits the partition key leaves the schema untouched") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_pipeline_partalter")
    try {
      Pipeline.loadInto(spark, "graft_pipeline_partalter",
        Seq((1L, "2024-01-01")).toDF("id", "load_date"), partitionBy = Seq("load_date"))
      intercept[IllegalArgumentException] {
        // new column `extra` + missing partition key: the reject must fire
        // BEFORE the ALTER, or the failed load mutates the table schema
        Pipeline.loadInto(spark, "graft_pipeline_partalter", Seq((2L, 1.5)).toDF("id", "extra"))
      }
      assert(spark.table("graft_pipeline_partalter").columns.toSeq == Seq("id", "load_date"),
        "rejected batch still ALTERed its new column into the table")
    } finally spark.sql("DROP TABLE IF EXISTS graft_pipeline_partalter")
  }

  test("loadInto evolves the table schema: new batch columns ALTER in, missing ones null-fill") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_pipeline_evolve")
    try {
      // batch 1: (id, v)
      Pipeline.loadInto(spark, "graft_pipeline_evolve", Seq((1L, "a")).toDF("id", "v"))
      // batch 2 adds a column the table has never seen
      Pipeline.loadInto(spark, "graft_pipeline_evolve", Seq((2L, "b", 9.5)).toDF("id", "v", "score"))
      // batch 3 DROPS a column the table has
      Pipeline.loadInto(spark, "graft_pipeline_evolve", Seq(3L).toDF("id"))
      val t = spark.table("graft_pipeline_evolve")
      assert(t.columns.toSeq == Seq("id", "v", "score"))
      val rows = t.collect().map(r =>
        (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).sortBy(_._1)
      assert(rows.toSeq == Seq(
        (1L, Some("a"), None),        // pre-drift row reads NULL for the new column
        (2L, Some("b"), Some(9.5)),
        (3L, None, None),             // short batch null-filled
      ))
    } finally spark.sql("DROP TABLE IF EXISTS graft_pipeline_evolve")
  }

  test("loadInto evolution sanitizes raw batch column names before diff/ALTER") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_pipeline_messy")
    try {
      Pipeline.loadInto(spark, "graft_pipeline_messy", Seq((1L, "a")).toDF("id", "Net Amount"))
      // second batch: same logical column under its RAW name must NOT
      // double-add or break ALTER; a genuinely new messy name must land sanitized
      Pipeline.loadInto(spark, "graft_pipeline_messy",
        Seq((2L, "b", 9.0)).toDF("id", "Net Amount", "Tax-Rate!"))
      val t = spark.table("graft_pipeline_messy")
      assert(t.columns.toSeq == Seq("id", "net_amount", "tax_rate"))
      assert(t.count() == 2)
    } finally spark.sql("DROP TABLE IF EXISTS graft_pipeline_messy")
  }

  test("loadInto refuses to null-fill a partition key (no silent default-partition rows)") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_pipeline_partguard")
    try {
      Pipeline.loadInto(spark, "graft_pipeline_partguard",
        Seq((1L, "2024-01-01")).toDF("id", "load_date"), partitionBy = Seq("load_date"))
      val err = intercept[IllegalArgumentException] {
        // a later batch missing the partition key must fail loudly, not
        // land every row in __HIVE_DEFAULT_PARTITION__
        Pipeline.loadInto(spark, "graft_pipeline_partguard", Seq(2L).toDF("id"))
      }
      assert(err.getMessage.contains("load_date"), s"wrong diagnosis: ${err.getMessage}")
      assert(spark.table("graft_pipeline_partguard").count() == 1)
    } finally spark.sql("DROP TABLE IF EXISTS graft_pipeline_partguard")
  }

  test("loadTable: partitioned load produces a partition-pruned layout") {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", "pipeline_part").toString
    writeCsv(dir, "p.csv", Seq(
      "id,Load Date",
      "1,2024-01-01",
      "2,2024-01-02",
    ))
    val df = Pipeline.loadTable(spark, dir, "graft_pipeline_part",
      partitionBy = Seq("Load Date"), overwrite = true)
    try {
      assert(df.count() == 2)
      val warehouse = Paths.get(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "graft_pipeline_part")
      val listing = Files.list(warehouse)
      // Files.list leaks a directory handle unless closed (same rule
      // Writers.deleteTree documents for Files.walk)
      val nPartDirs =
        try listing.filter(p => p.getFileName.toString.startsWith("load_date=")).count()
        finally listing.close()
      assert(nPartDirs == 2, "expected one directory per load_date partition")
    } finally spark.sql("DROP TABLE IF EXISTS graft_pipeline_part")
  }
}
