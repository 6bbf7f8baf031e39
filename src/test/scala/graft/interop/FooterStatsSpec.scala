package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Parity proof for the footer-decoded commit statistics: whatever the
  * old second distributed pass (min/max/null-count aggregates over the
  * freshly staged files) computed, [[FooterStats]] must reproduce from
  * the parquet footers alone — per type, with nulls, across several
  * files and row groups. */
class FooterStatsSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def sparkStats(path: String, cols: Seq[StructField])
      : Map[String, (Long, Map[String, Any], Map[String, Any], Map[String, Long])] = {
    val df = spark.read.parquet(path)
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { f =>
      Seq(min(col(f.name)).as(s"__mn_${f.name}"), max(col(f.name)).as(s"__mx_${f.name}"),
        sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"__nc_${f.name}"))
    }
    df.groupBy(input_file_name().as("__f")).agg(aggs.head, aggs.tail: _*)
      .collect().map { r =>
        val mins = cols.flatMap(f => Option(r.getAs[Any](s"__mn_${f.name}")).map(f.name -> _)).toMap
        val maxs = cols.flatMap(f => Option(r.getAs[Any](s"__mx_${f.name}")).map(f.name -> _)).toMap
        val ncs = cols.map(f => f.name -> r.getAs[Long](s"__nc_${f.name}")).toMap
        new java.net.URI(r.getAs[String]("__f")).getPath ->
          ((r.getAs[Long]("__n"), mins, maxs, ncs))
      }.toMap
  }

  private def footer(path: String, cols: Seq[StructField])
      : Map[String, FooterStats.FileStats] = {
    val (fs, root) = Writers.fsFor(path)
    val files = fs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    files.map(f => f.toUri.getPath -> FooterStats.read(fs.getConf, f, cols)).toMap
  }

  private def normalize(v: Any): Any = v match {
    case t: java.sql.Timestamp => t.toInstant
    case d: java.sql.Date => d.toString
    case b: java.math.BigDecimal => b.stripTrailingZeros
    case other => other
  }

  test("footer stats equal the distributed pass across every statable type") {
    val path = freshDir("footer_parity")
    val df = spark.range(0, 10000, 1, 4).selectExpr(
      "cast(id as int) as i",
      "id as l",
      "cast(id % 100 as tinyint) as b8",
      "cast(id % 100 as smallint) as s16",
      "cast(id as float) / 7 as f",
      "cast(id as double) / 3 as d",
      "id % 2 = 0 as bool",
      "concat('v', lpad(cast(id as string), 6, '0')) as s",
      "case when id % 5 = 0 then null else concat('n', id) end as s_null",
      "cast(cast(id as double) / 100 as decimal(12,2)) as dec",
      "cast(date_add(date '2020-01-01', cast(id % 900 as int)) as date) as dt",
      "timestamp_millis(1500000000000 + id * 1000) as ts",
      "cast(null as string) as all_null")
    // the staging writers pin INT64-micros timestamps (INT96 has no
    // footer stats); the parity harness writes the same physical shape
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try df.write.mode(SaveMode.Overwrite).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    val cols = df.schema.fields.toSeq
    val fromSpark = sparkStats(path, cols)
    val fromFooter = footer(path, cols)
    assert(fromSpark.keySet == fromFooter.keySet)
    assert(fromSpark.nonEmpty)
    fromSpark.foreach { case (file, (n, mins, maxs, ncs)) =>
      val fst = fromFooter(file)
      assert(fst.records == n, s"records of $file")
      cols.foreach { f =>
        assert(fst.mins.get(f.name).map(normalize) == mins.get(f.name).map(normalize),
          s"min of ${f.name} in $file")
        assert(fst.maxs.get(f.name).map(normalize) == maxs.get(f.name).map(normalize),
          s"max of ${f.name} in $file")
        assert(fst.nullCounts.get(f.name).contains(ncs(f.name)),
          s"nullCount of ${f.name} in $file")
      }
    }
  }

  test("multi-row-group files aggregate block windows; unicode strings keep byte order") {
    val path = freshDir("footer_blocks")
    // force several row groups per file: tiny row-group size
    val prev = spark.conf.getOption("spark.hadoop.parquet.block.size")
    spark.conf.set("spark.hadoop.parquet.block.size", "1024")
    try {
      val df = spark.range(0, 50000, 1, 1).selectExpr(
        "id as l",
        // U+1F600 sits above the BMP: UTF-8 byte order differs from
        // UTF-16 code-unit order for such strings — the footer compare
        // must match Spark's (UTF-8 based) ordering
        "case when id % 7 = 0 then concat('😀', id) else concat('z', id) end as s")
      df.write.mode(SaveMode.Overwrite).parquet(path)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.hadoop.parquet.block.size", v)
      case None => spark.conf.unset("spark.hadoop.parquet.block.size")
    }
    val cols = Seq(StructField("l", LongType), StructField("s", StringType))
    val fromSpark = sparkStats(path, cols)
    val fromFooter = footer(path, cols)
    fromSpark.foreach { case (file, (n, mins, maxs, _)) =>
      val fst = fromFooter(file)
      assert(fst.records == n)
      assert(fst.mins.get("l") == mins.get("l") && fst.maxs.get("l") == maxs.get("l"))
      assert(fst.mins.get("s") == mins.get("s") && fst.maxs.get("s") == maxs.get("s"))
    }
  }

  test("a Delta commit's stats JSON is footer-complete: windows, null counts, records") {
    import spark.implicits._
    val path = freshDir("footer_delta")
    val df = Seq(
      (1L, Some("a"), java.sql.Timestamp.from(java.time.Instant.parse("2021-03-04T05:06:07.123456Z"))),
      (2L, None, java.sql.Timestamp.from(java.time.Instant.parse("2021-03-04T05:06:08.999999Z"))),
      (3L, Some("c"), java.sql.Timestamp.from(java.time.Instant.parse("2021-03-04T05:06:06.000001Z"))),
    ).toDF("k", "v", "ts").coalesce(1)
    DeltaLake.write(df, path)
    val log = new String(java.nio.file.Files.readAllBytes(
      Paths.get(path, "_delta_log", "0" * 20 + ".json")), "UTF-8")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val add = log.split('\n').map(mapper.readTree).find(_.has("add")).get.get("add")
    val st = mapper.readTree(add.get("stats").asText)
    assert(st.get("numRecords").asLong == 3L)
    assert(st.get("minValues").get("k").asLong == 1L)
    assert(st.get("maxValues").get("k").asLong == 3L)
    assert(st.get("minValues").get("v").asText == "a")
    assert(st.get("maxValues").get("v").asText == "c")
    assert(st.get("nullCount").get("v").asLong == 1L)
    assert(st.get("nullCount").get("k").asLong == 0L)
    // timestamp window: min floors, max ceils (ISO UTC), so it widens
    val lo = java.time.Instant.parse(st.get("minValues").get("ts").asText)
    val hi = java.time.Instant.parse(st.get("maxValues").get("ts").asText)
    assert(!lo.isAfter(java.time.Instant.parse("2021-03-04T05:06:06.000001Z")))
    assert(!hi.isBefore(java.time.Instant.parse("2021-03-04T05:06:08.999999Z")))
  }
}
