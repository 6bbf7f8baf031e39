package graft.ingest

import graft.SparkFixture
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WritersSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p) // the production recursive delete, not a spec-local copy
    p.toString
  }

  test("incremental append: initial batch + watermark delta reconstructs the table") {
    import spark.implicits._
    val path = freshDir("incr")
    val all = (1L to 100L).map(i => (i, i % 7)).toDF("id", "grp")
    val batch1 = all.filter(col("id") <= 60)
    batch1.write.mode(SaveMode.Overwrite).parquet(path)
    val wm = Writers.incrementalAppend(all, "id", Some(60L), path)
    assert(wm.contains(100L))
    assert(spark.read.parquet(path).count() == 100)
    assert(spark.read.parquet(path).select("id").distinct().count() == 100)
  }

  test("incremental append with no new rows appends nothing") {
    import spark.implicits._
    val path = freshDir("incr_empty")
    val all = (1L to 10L).toDF("id")
    all.write.mode(SaveMode.Overwrite).parquet(path)
    val wm = Writers.incrementalAppend(all, "id", Some(10L), path)
    // nothing fresh → the CALLER'S watermark comes back, so the
    // documented chaining pattern (feed the return value into the next
    // run) never degrades an idle run into a full re-append
    assert(wm == Some(10L))
    assert(spark.read.parquet(path).count() == 10)
    // and chaining that watermark into another idle run still appends nothing
    assert(Writers.incrementalAppend(all, "id", wm, path) == Some(10L))
    assert(spark.read.parquet(path).count() == 10)
  }

  test("partitioned write lays out partition directories") {
    import spark.implicits._
    val path = freshDir("part")
    val df = Seq((1L, "A"), (2L, "B"), (3L, "A")).toDF("id", "k")
    Writers.partitioned(df, path, Seq("k"))
    assert(Files.exists(Paths.get(path, "k=A")))
    assert(Files.exists(Paths.get(path, "k=B")))
    assert(spark.read.parquet(path).count() == 3)
  }

  test("upsert replaces matching keys and appends new ones") {
    import spark.implicits._
    val path = freshDir("upsert")
    Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("k", "v")
      .write.mode(SaveMode.Overwrite).parquet(path)
    Writers.upsertByKey(spark, path, Seq((2L, "new2"), (4L, "new4")).toDF("k", "v"), "k")
    val got = spark.read.parquet(path).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "old1", 2L -> "new2", 3L -> "old3", 4L -> "new4"))
  }

  test("incremental append with an added column reads back whole via parquetMerged") {
    import spark.implicits._
    val path = freshDir("incr_evolve")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode(SaveMode.Overwrite).parquet(path)
    // the next day's extract carries a new column
    val wm = Writers.incrementalAppend(
      Seq((3L, "c", 1.5)).toDF("id", "v", "score"), "id", Some(2L), path)
    assert(wm.contains(3L))
    // plain read trusts one footer and may miss the new column; the
    // evolution-aware read surfaces it, NULL for pre-drift files
    val merged = Readers.parquetMerged(spark, path)
    assert(merged.columns.sorted.toSeq == Seq("id", "score", "v"))
    val rows = merged.collect().map(r => r.getLong(0) -> Option(r.get(merged.columns.indexOf("score")))).toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(1.5)))
  }

  test("scdType2 closes old versions, preserves history, and stamps new current rows") {
    import spark.implicits._
    val path = freshDir("scd2")
    // version 1: two customers
    Writers.scdType2(spark, path, Seq((1L, "GOLD"), (2L, "SILVER")).toDF("k", "tier"), "k", 1L)
    // version 2: customer 1 changes tier, customer 3 appears
    Writers.scdType2(spark, path, Seq((1L, "PLATINUM"), (3L, "BRONZE")).toDF("k", "tier"), "k", 2L)
    // version 3: customer 1 changes AGAIN — v2's row must close, v1's stay closed
    Writers.scdType2(spark, path, Seq((1L, "VIP")).toDF("k", "tier"), "k", 3L)
    val rows = spark.read.parquet(path)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .sortBy(r => (r._1, r._3))
    assert(rows.toSeq == Seq(
      (1L, "GOLD", 1L, Some(2L)),     // closed by v2
      (1L, "PLATINUM", 2L, Some(3L)), // closed by v3
      (1L, "VIP", 3L, None),          // current
      (2L, "SILVER", 1L, None),       // untouched current
      (3L, "BRONZE", 2L, None),       // appeared in v2, still current
    ))
    // point-in-time query: state as of version 2
    val asOfV2 = spark.read.parquet(path)
      .where("valid_from <= 2 AND (valid_to IS NULL OR valid_to > 2)")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(asOfV2 == Map(1L -> "PLATINUM", 2L -> "SILVER", 3L -> "BRONZE"))
  }

  test("scdType2 rejects out-of-order and replayed versions; preserves a Hive layout") {
    import spark.implicits._
    val path = freshDir("scd2_guard")
    Writers.scdType2(spark, path,
      Seq((1L, "GOLD", "eu"), (2L, "SILVER", "us")).toDF("k", "tier", "region"), "k", 2L)
    // replay at the SAME version and an EARLIER version must both fail —
    // closing a current row with version <= its valid_from writes
    // inverted/zero-length intervals that corrupt point-in-time reads
    for (bad <- Seq(2L, 1L)) {
      val err = intercept[IllegalArgumentException] {
        Writers.scdType2(spark, path, Seq((1L, "X", "eu")).toDF("k", "tier", "region"), "k", bad)
      }
      assert(err.getMessage.contains("out-of-order"), s"wrong diagnosis: ${err.getMessage}")
    }
    // partitioned layout survives an apply (upsert/compact parity)
    val partedPath = freshDir("scd2_parts")
    Seq((1L, "GOLD", "eu", 1L), (2L, "SILVER", "us", 1L))
      .toDF("k", "tier", "region", "valid_from")
      .withColumn("valid_to", lit(null).cast("long"))
      .write.partitionBy("region").parquet(partedPath)
    Writers.scdType2(spark, partedPath, Seq((1L, "VIP", "eu")).toDF("k", "tier", "region"), "k", 5L)
    assert(Files.exists(Paths.get(partedPath, "region=eu")),
      "scdType2 flattened the Hive-partitioned layout")
    val current = spark.read.parquet(partedPath).where("valid_to IS NULL")
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("tier")).toMap
    assert(current == Map(1L -> "VIP", 2L -> "SILVER"))
  }

  test("upsert rejects NULL merge keys with a null-specific message, not 'duplicate key'") {
    import spark.implicits._
    val path = freshDir("upsert_nullkey")
    Seq((1L, "a")).toDF("k", "v").write.mode(SaveMode.Overwrite).parquet(path)
    val updates = Seq((2L, "b")).toDF("k", "v")
      .unionByName(Seq("c").toDF("v").withColumn("k", lit(null).cast("long")).select("k", "v"))
    val err = intercept[IllegalArgumentException] {
      Writers.upsertByKey(spark, path, updates, "k")
    }
    assert(err.getMessage.contains("NULL"), s"wrong diagnosis: ${err.getMessage}")
    assert(!err.getMessage.contains("duplicate"), s"misleading diagnosis: ${err.getMessage}")
  }

  test("upsert into a missing path creates it") {
    import spark.implicits._
    val path = freshDir("upsert_new") + "/sub"
    Writers.upsertByKey(spark, path, Seq((1L, "a")).toDF("k", "v"), "k")
    assert(spark.read.parquet(path).count() == 1)
  }

  test("a crashed swap (data parked in __old) recovers instead of reading as empty") {
    import spark.implicits._
    val path = freshDir("upsert_crash")
    Seq((1L, "old1"), (2L, "old2")).toDF("k", "v").write.mode(SaveMode.Overwrite).parquet(path)
    // simulate a crash between the two swap renames: data moved aside, nothing moved in
    Files.move(Paths.get(path), Paths.get(path + "__old"))
    Writers.upsertByKey(spark, path, Seq((2L, "new2")).toDF("k", "v"), "k")
    val got = spark.read.parquet(path).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "old1", 2L -> "new2"), s"pre-crash rows lost: $got")
    assert(!Files.exists(Paths.get(path + "__old")), "rename-aside copy not cleaned up")
  }

  test("a crash leaving BOTH a stale staging dir and a parked __old recovers cleanly") {
    import spark.implicits._
    val path = freshDir("upsert_crash_tmp")
    Seq((1L, "old1"), (2L, "old2")).toDF("k", "v").write.mode(SaveMode.Overwrite).parquet(path)
    // crash at the WORST point of a previous upsert: its merged output is
    // fully staged in __upsert_tmp, the live dataset was renamed aside,
    // and the swap-in rename never ran (target missing). The stale staging
    // rows must never surface — the crashed run's merge is lost by design,
    // the pre-crash data is not.
    Seq((1L, "half-merged"), (9L, "ghost")).toDF("k", "v")
      .write.mode(SaveMode.Overwrite).parquet(path + "__upsert_tmp")
    Files.move(Paths.get(path), Paths.get(path + "__old"))
    Writers.upsertByKey(spark, path, Seq((2L, "new2")).toDF("k", "v"), "k")
    val got = spark.read.parquet(path).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "old1", 2L -> "new2"),
      s"recovery mixed in stale staged rows or lost pre-crash rows: $got")
    assert(!Files.exists(Paths.get(path + "__old")), "rename-aside copy not cleaned up")
    assert(!Files.exists(Paths.get(path + "__upsert_tmp")), "stale staging dir left behind")
  }

  test("upsert and compact preserve a Hive-partitioned layout") {
    import spark.implicits._
    val path = freshDir("upsert_part")
    Seq((1L, "A", "x"), (2L, "B", "y")).toDF("id", "pt", "v")
      .write.mode(SaveMode.Overwrite).partitionBy("pt").parquet(path)
    Writers.upsertByKey(spark, path, Seq((1L, "A", "x2")).toDF("id", "pt", "v"), "id")
    assert(Files.exists(Paths.get(path, "pt=A")), "partition dirs flattened by upsert")
    val (_, _) = Writers.compact(spark, path, 128)
    assert(Files.exists(Paths.get(path, "pt=A")), "partition dirs flattened by compact")
    val got = spark.read.parquet(path).collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("v"))).toMap
    assert(got == Map(1L -> "x2", 2L -> "y"))
  }

  test("compact merges many small files without losing rows") {
    import spark.implicits._
    val path = freshDir("compact")
    (1L to 1000L).toDF("id").repartition(50).write.mode(SaveMode.Overwrite).parquet(path)
    val (before, after) = Writers.compact(spark, path, targetMB = 128)
    assert(before == 50)
    assert(after < before)
    assert(spark.read.parquet(path).count() == 1000)
    assert(spark.read.parquet(path).agg(sum(col("id"))).collect().head.getLong(0) == 500500L)
  }

  test("bucketed refuses to destroy an EXTERNAL table at its default managed path") {
    import spark.implicits._
    val table = "graft_bucketed_ext_guard"
    val dtp = spark.sessionState.catalog
      .defaultTablePath(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val df = (1L to 10L).map(i => (i % 3, i)).toDF("k", "v")
    try {
      // EXTERNAL table whose location IS the default managed path — the
      // collide case where DROP preserves files a managed recreate would
      // silently shadow (or a blunt cleanup would delete)
      df.write.parquet(dtp.toString)
      spark.sql(s"CREATE TABLE $table (k BIGINT, v BIGINT) USING parquet LOCATION '$dtp'")
      val e = intercept[IllegalArgumentException] {
        Writers.bucketed(df, table, "k", 2)
      }
      assert(e.getMessage.contains("EXTERNAL"))
      // the preserved data must still be there
      assert(spark.read.parquet(dtp.toString).count() == 10)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      Writers.deleteTree(dtp.toString)
    }
  }

  test("csvWithRejects quarantines malformed rows with their raw lines, keeps clean rows typed") {
    import org.apache.spark.sql.types._
    val dir = Paths.get(freshDir("csv_rejects"))
    Files.createDirectories(dir)
    Files.write(dir.resolve("data.csv"), String.join("\n",
      "id,amount",
      "1,10.5",
      "2,notanumber", // type mismatch → reject
      "3,30.25",
    ).getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("amount", DoubleType),
    ))
    val load = Readers.csvWithRejects(spark, dir.toString, schema)
    try {
      assert(load.good.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
      val badLines = load.rejects.collect().map(_.getString(0))
      assert(badLines.toSeq == Seq("2,notanumber"), "reject must carry the raw line for replay")
    } finally load.release()
  }

  test("csvWithRejects also quarantines short and over-long rows (Spark 4 CSV semantics)") {
    import org.apache.spark.sql.types._
    val dir = Paths.get(freshDir("csv_rejects_arity"))
    Files.createDirectories(dir)
    Files.write(dir.resolve("data.csv"), String.join("\n",
      "id,amount",
      "1,10.5",
      "2",             // too few columns
      "3,30.25,extra", // too many columns
    ).getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("amount", DoubleType),
    ))
    val load = Readers.csvWithRejects(spark, dir.toString, schema)
    try {
      assert(load.good.collect().map(_.getLong(0)).toSeq == Seq(1L),
        "arity-mismatched rows must not silently null-fill into the clean slice")
      assert(load.rejects.collect().map(_.getString(0)).sorted.toSeq == Seq("2", "3,30.25,extra"))
    } finally load.release()
  }

  test("csv reader sanitizes messy headers and infers types") {
    val path = freshDir("csv")
    Files.createDirectories(Paths.get(path))
    Files.writeString(Paths.get(path, "data.csv"), "User ID!,Full Name,Score %\n1,alice,95\n2,bob,87\n")
    val df = Readers.csv(spark, path)
    assert(df.columns.toSeq == Seq("user_id", "full_name", "score"))
    assert(df.count() == 2)
    assert(df.schema("user_id").dataType.typeName == "integer")
  }
}
