package graft.interop

import graft.SparkFixture
import graft.ingest.Writers
import java.nio.file.Paths
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Iceberg MANIFEST-LIST PARTITION SUMMARIES (spec field 507) and the
  * manifest-pruning lazy planner: a partition/stats filter must veto
  * whole manifests from the manifest-list record alone — BEFORE any
  * manifest Avro is fetched — turning planning-metadata IO from
  * O(manifests) into O(matching manifests). The claims:
  *
  *  - identity equality/range probes fetch only overlapping manifests
  *    ([[IcebergIntrospect.lastManifestPlanning]] is the counter);
  *  - transform (bucket) probes map through the spec transform first;
  *  - a MULTI-SPEC table prunes each manifest under its own spec;
  *  - [[Iceberg.rewriteManifests]] recomputes summaries for merged
  *    manifests;
  *  - results are bit-identical to the eager walk (the
  *    `spark.graft.iceberg.manifestListPruning=false` kill-switch is
  *    the A/B seam), including all-null partitions. */
class ManifestPruningSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def df(rows: (Int, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("p", "k", "v")
  }

  /** The LAZY run's planning record, captured before the eager A/B run
    * overwrites it (the eager walk records (total, total) for
    * introspection symmetry); the eager run's record lands in
    * [[lastEagerPlanning]]. */
  private var lastLazyPlanning: Option[(Int, Int)] = None
  private var lastEagerPlanning: Option[(Int, Int)] = None

  private def collectBoth(path: String, q: DataFrame => DataFrame): (Seq[String], Seq[String]) = {
    def run(): Seq[String] =
      q(Iceberg.read(spark, path)).collect().map(_.mkString("|")).toSeq.sorted
    val lazyRows = run()
    lastLazyPlanning = IcebergIntrospect.lastManifestPlanning(path)
    spark.conf.set("spark.graft.iceberg.manifestListPruning", "false")
    val eagerRows = try run()
    finally spark.conf.unset("spark.graft.iceberg.manifestListPruning")
    lastEagerPlanning = IcebergIntrospect.lastManifestPlanning(path)
    (lazyRows, eagerRows)
  }

  test("identity partition: equality fetches one manifest of three") {
    val path = freshDir("ice_mfprune_ident")
    Iceberg.write(df((1, 10L, "a"), (2, 11L, "b")), path, partitionBy = Seq("p"))
    Iceberg.write(df((4, 12L, "c"), (5, 13L, "d")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    Iceberg.write(df((8, 14L, "e"), (9, 15L, "f")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)

    val (lz, eg) = collectBoth(path, _.filter(col("p") === 8))
    assert(lz == eg && lz == Seq("14|e|8"))
    val (fetched, total) = lastLazyPlanning.get
    assert(total == 3, s"expected 3 data manifests, saw $total")
    assert(fetched == 1, s"field-507 pruning must fetch ONLY the matching manifest, fetched $fetched")
    // the file-level introspection stays on full-table denominators
    val (kept, fTotal) = org.apache.spark.sql.graft.VersionedFileIndex.lastPlanned(path).get
    assert(fTotal == 6 && kept <= 1, s"file planning saw ($kept, $fTotal)")
  }

  test("identity partition: range probe prunes low manifests; manifest opens counted") {
    val path = freshDir("ice_mfprune_range")
    Iceberg.write(df((1, 1L, "a"), (2, 2L, "b")), path, partitionBy = Seq("p"))
    Iceberg.write(df((5, 3L, "c")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    Iceberg.write(df((8, 4L, "d"), (9, 5L, "e")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    IcebergIntrospect.resetManifestOpens(path)
    val (lz, eg) = collectBoth(path, _.filter(col("p") >= 7).select(col("v")))
    assert(lz == eg && lz == Seq("d", "e"))
    val (fetched, total) = lastLazyPlanning.get
    assert(total == 3 && fetched == 1, s"range probe planned ($fetched, $total)")
    // the cumulative open counter proves fetches, not bookkeeping:
    // the pruned plan opened exactly 1; the eager A/B run opened all 3
    assert(IcebergIntrospect.manifestOpens(path) == 4L,
      s"opens = ${IcebergIntrospect.manifestOpens(path)} (want 1 lazy + 3 eager)")
  }

  test("all-null partition values: contains_null manifest pruned for equality, kept for scan") {
    val path = freshDir("ice_mfprune_null")
    import spark.implicits._
    val withNull = Seq((Option.empty[Int], 20L, "n1"), (Option.empty[Int], 21L, "n2"))
      .toDF("p", "k", "v")
    Iceberg.write(df((3, 22L, "x")), path, partitionBy = Seq("p"))
    Iceberg.write(withNull, path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    // equality can never match the all-null manifest -> 1 of 2
    val (lz, eg) = collectBoth(path, _.filter(col("p") === 3).select(col("v")))
    assert(lz == eg && lz == Seq("x"))
    assert(lastLazyPlanning.get == ((1, 2)))
    // a full scan still reads the null rows
    val (lzAll, egAll) = collectBoth(path, identity)
    assert(lzAll == egAll && lzAll.size == 3)
  }

  test("bucket transform: equality maps through murmur3 and prunes disjoint-bucket manifests") {
    val path = freshDir("ice_mfprune_bucket")
    import graft.functions.IcebergTransforms
    // pick keys landing in bucket 0 vs bucket 3 (of 4)
    val lowKeys = (1L to 400L).filter(k => IcebergTransforms.bucketLong(k, 4) == 0).take(3)
    val hiKeys = (1L to 400L).filter(k => IcebergTransforms.bucketLong(k, 4) == 3).take(3)
    Iceberg.write(df(lowKeys.map(k => (1, k, s"low$k")): _*), path,
      partitionBy = Seq("bucket(4, k)"))
    Iceberg.write(df(hiKeys.map(k => (2, k, s"hi$k")): _*), path,
      partitionBy = Seq("bucket(4, k)"),
      mode = org.apache.spark.sql.SaveMode.Append)
    val probe = hiKeys.head
    val (lz, eg) = collectBoth(path, _.filter(col("k") === probe).select(col("v")))
    assert(lz == eg && lz == Seq(s"hi$probe"))
    assert(lastLazyPlanning.get == ((1, 2)),
      s"bucket probe planned $lastLazyPlanning")
  }

  test("multi-spec table: each manifest prunes under its own spec") {
    val path = freshDir("ice_mfprune_evo")
    import spark.implicits._
    def tdf(rows: (Long, String, String)*): DataFrame =
      rows.map { case (k, t, v) =>
        (k, java.time.LocalDateTime.parse(t.replace(' ', 'T')), v)
      }.toDF("k", "ts", "v")
    // era 1: days(ts), two commits on different days
    Iceberg.write(tdf((1L, "2024-01-01 03:00:00", "a")), path, partitionBy = Seq("days(ts)"))
    Iceberg.write(tdf((2L, "2024-02-01 09:00:00", "b")), path,
      partitionBy = Seq("days(ts)"), mode = org.apache.spark.sql.SaveMode.Append)
    // era 2: hours(ts)
    assert(Iceberg.replaceSpec(spark, path, Seq("hours(ts)")) == 1)
    Iceberg.write(tdf((3L, "2024-03-01 12:30:00", "c")), path,
      mode = org.apache.spark.sql.SaveMode.Append)
    val want = java.sql.Timestamp.valueOf("2024-02-01 09:00:00")
    val (lz, eg) = collectBoth(path,
      _.filter(col("ts") === want).select(col("v")))
    assert(lz == eg && lz == Seq("b"))
    val (fetched, total) = lastLazyPlanning.get
    assert(total == 3 && fetched == 1,
      s"multi-spec probe planned ($fetched, $total): day manifests must prune by day " +
        "value, the hour manifest by hour value")
  }

  test("rewriteManifests recomputes field-507 summaries for merged manifests") {
    val path = freshDir("ice_mfprune_rewrite")
    Iceberg.write(df((1, 0L, "v0"), (2, 1L, "w0")), path, partitionBy = Seq("p"))
    for (i <- 1 until 4) {
      val base = i * 10
      Iceberg.write(df((base + 1, base.toLong, s"v$i"), (base + 2, base + 1L, s"w$i")), path,
        partitionBy = Seq("p"), mode = org.apache.spark.sql.SaveMode.Append)
    }
    val (before, after) = Iceberg.rewriteManifests(spark, path)
    assert(before == 4 && after == 1, s"bin-pack $before -> $after")
    // two more small commits so there is something left to prune
    Iceberg.write(df((51, 100L, "t1")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    Iceberg.write(df((61, 101L, "t2")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    // probe inside the MERGED manifest's range: the two tail manifests prune
    val (lz, eg) = collectBoth(path, _.filter(col("p") === 12).select(col("v")))
    assert(lz == eg && lz == Seq("w1"))
    assert(lastLazyPlanning.get == ((1, 3)),
      s"merged-manifest probe planned $lastLazyPlanning")
    // probe in a tail manifest: the merged one prunes
    val (lz2, eg2) = collectBoth(path, _.filter(col("p") === 61).select(col("v")))
    assert(lz2 == eg2 && lz2 == Seq("t2"))
    assert(lastLazyPlanning.get == ((1, 3)))
  }

  test("snapshot summary totals accumulate on append and restart on overwrite") {
    val path = freshDir("ice_summary_totals")
    Iceberg.write(df((1, 1L, "a"), (2, 2L, "b")), path, partitionBy = Seq("p"))
    Iceberg.write(df((3, 3L, "c")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    def summary(): Map[String, String] = {
      val dir = java.nio.file.Paths.get(path, "metadata")
      val latest = java.nio.file.Files.list(dir).iterator()
      var vs = List.empty[java.nio.file.Path]
      while (latest.hasNext) { val p = latest.next()
        if (p.toString.endsWith(".metadata.json")) vs ::= p }
      val meta = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new String(java.nio.file.Files.readAllBytes(
          vs.maxBy(_.getFileName.toString)), "UTF-8"))
      val cur = meta.get("current-snapshot-id").asLong
      var out = Map.empty[String, String]
      val it = meta.get("snapshots").elements()
      while (it.hasNext) { val sn = it.next()
        if (sn.get("snapshot-id").asLong == cur) {
          val props = sn.get("summary").properties().iterator()
          while (props.hasNext) { val e = props.next()
            out += e.getKey -> e.getValue.asText }
        }
      }
      out
    }
    val s1 = summary()
    assert(s1("total-records") == "3" && s1("total-data-files").toInt >= 2 &&
      s1("added-records") == "1",
      s"append must carry forward totals, got $s1")
    assert(s1("total-files-size").toLong > 0)
    // overwrite restarts the totals at its own adds
    Iceberg.write(df((9, 9L, "z")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Overwrite)
    val s2 = summary()
    assert(s2("total-records") == "1" && s2("added-records") == "1",
      s"overwrite must restart totals, got $s2")
  }

  test("adversarial sweep: lazy == eager under a predicate battery over mixed types") {
    import org.apache.spark.sql.Column
    val path = freshDir("ice_mfprune_sweep")
    import spark.implicits._
    // identity int partition + identity date partition + a bucket(4)
    // transform on a long key; several commits with overlapping,
    // disjoint, negative, and NULL partition values
    def batch(rows: Seq[(Option[Int], String, Long, String)]) =
      rows.map { case (p, d, k, v) =>
        (p, java.sql.Date.valueOf(d), k, v)
      }.toDF("p", "d", "k", "v")
    Iceberg.write(batch(Seq((Some(1), "2024-01-01", 10L, "a"), (Some(2), "2024-01-02", 11L, "b"))),
      path, partitionBy = Seq("p", "d", "bucket(4, k)"))
    val appends = Seq(
      Seq((Some(-5), "2023-12-30", 12L, "c"), (Some(0), "2024-01-01", 13L, "d")),
      Seq((Some(7), "2024-02-10", 14L, "e"), (Some(9), "2024-02-11", 15L, "f")),
      Seq((None, "2024-03-01", 16L, "g"), (None, "2024-03-02", 17L, "h")),
      Seq((Some(2), "2024-01-02", 18L, "i"), (Some(7), "2024-02-10", 19L, "j")))
    appends.foreach(rows => Iceberg.write(batch(rows), path,
      partitionBy = Seq("p", "d", "bucket(4, k)"),
      mode = org.apache.spark.sql.SaveMode.Append))
    import org.apache.spark.sql.functions.{col, lit}
    val preds: Seq[(String, Column)] = Seq(
      "p = 2" -> (col("p") === 2),
      "p = -5" -> (col("p") === -5),
      "p = 100" -> (col("p") === 100),
      "p >= 7" -> (col("p") >= 7),
      "p < 0" -> (col("p") < 0),
      "p <= -5" -> (col("p") <= -5),
      "p IN (0, 9, 42)" -> col("p").isin(0, 9, 42),
      "p IS NULL" -> col("p").isNull,
      "p IS NOT NULL" -> col("p").isNotNull,
      "p = 2 AND d = 2024-01-02" -> (col("p") === 2 && col("d") === lit("2024-01-02").cast("date")),
      "d = 2024-03-01" -> (col("d") === lit("2024-03-01").cast("date")),
      "d >= 2024-02-01" -> (col("d") >= lit("2024-02-01").cast("date")),
      "d < 2024-01-01" -> (col("d") < lit("2024-01-01").cast("date")),
      "k = 14" -> (col("k") === 14L),
      "k = 999" -> (col("k") === 999L),
      "k IN (10, 16)" -> col("k").isin(10L, 16L),
      "p = 7 OR p = 1" -> (col("p") === 7 || col("p") === 1), // OR: never pruned, still exact
      "v = 'g'" -> (col("v") === "g"),
      "p > 0 AND p < 3 AND k >= 10" -> (col("p") > 0 && col("p") < 3 && col("k") >= 10L))
    preds.foreach { case (label, pred) =>
      def run(): Seq[String] =
        Iceberg.read(spark, path).filter(pred).collect().map(_.mkString("|")).toSeq.sorted
      val lazyRows = run()
      spark.conf.set("spark.graft.iceberg.manifestListPruning", "false")
      val eagerRows = try run()
      finally spark.conf.unset("spark.graft.iceberg.manifestListPruning")
      assert(lazyRows == eagerRows,
        s"[$label] lazy (${lazyRows.size} rows) != eager (${eagerRows.size} rows)")
    }
    // now put the SAME battery under EQUALITY-DELETE debt: delete one
    // key, re-insert it after (the version-sequenced trap), and run
    // every predicate through the bounds-classified group plan vs the
    // eager walk — filters must push through the union + anti-joins
    // without changing a single row
    Iceberg.deleteEquality(spark, path, Seq(13L).toDF("k"))
    Iceberg.write(batch(Seq((Some(0), "2024-01-01", 13L, "d2"))), path,
      partitionBy = Seq("p", "d", "bucket(4, k)"),
      mode = org.apache.spark.sql.SaveMode.Append)
    preds.foreach { case (label, pred) =>
      def run(): Seq[String] =
        Iceberg.read(spark, path).filter(pred).collect().map(_.mkString("|")).toSeq.sorted
      val lazyRows = run()
      spark.conf.set("spark.graft.iceberg.manifestListPruning", "false")
      val eagerRows = try run()
      finally spark.conf.unset("spark.graft.iceberg.manifestListPruning")
      assert(lazyRows == eagerRows,
        s"[eq-debt $label] lazy (${lazyRows.size}) != eager (${eagerRows.size})")
      assert(!lazyRows.exists(_.contains("13|d|")),
        s"[eq-debt $label] the deleted row 13|d must not surface: $lazyRows")
      (): Unit
    }
    // the re-inserted key survives, the deleted image never returns
    val full = Iceberg.read(spark, path).collect().map(_.mkString("|")).toSeq
    assert(full.exists(_.contains("13|d2|")) && !full.exists(_.contains("13|d|")),
      s"version-sequencing under the battery table: $full")
  }

  test("timestamp identity partitions: micros-domain bounds prune and stay exact") {
    val path = freshDir("ice_mfprune_ts")
    import spark.implicits._
    def batch(rows: (String, Long)*) = rows.map { case (t, k) =>
      (java.sql.Timestamp.valueOf(t), k)
    }.toDF("ts", "k")
    Iceberg.write(batch(("2024-01-01 00:00:00", 1L), ("2024-01-01 06:30:00", 2L)),
      path, partitionBy = Seq("ts"))
    Iceberg.write(batch(("2024-02-15 12:00:00", 3L), ("2024-02-15 23:59:59", 4L)),
      path, partitionBy = Seq("ts"), mode = org.apache.spark.sql.SaveMode.Append)
    Iceberg.write(batch(("2024-03-31 08:00:00", 5L)),
      path, partitionBy = Seq("ts"), mode = org.apache.spark.sql.SaveMode.Append)
    import org.apache.spark.sql.functions.{col, lit}
    def both(label: String, pred: org.apache.spark.sql.Column, expect: Seq[Long]): Unit = {
      def run(): Seq[Long] =
        Iceberg.read(spark, path).filter(pred).select("k")
          .collect().map(_.getLong(0)).toSeq.sorted
      val lz = run()
      lastLazyPlanning = IcebergIntrospect.lastManifestPlanning(path)
      spark.conf.set("spark.graft.iceberg.manifestListPruning", "false")
      val eg = try run()
      finally spark.conf.unset("spark.graft.iceberg.manifestListPruning")
      assert(lz == eg && lz == expect, s"[$label] lazy=$lz eager=$eg want=$expect")
    }
    both("eq", col("ts") === lit("2024-02-15 12:00:00").cast("timestamp"), Seq(3L))
    assert(lastLazyPlanning.get == ((1, 3)),
      "a timestamp equality must fetch only its manifest")
    both("range", col("ts") >= lit("2024-02-01 00:00:00").cast("timestamp") &&
      col("ts") < lit("2024-03-01 00:00:00").cast("timestamp"), Seq(3L, 4L))
    assert(lastLazyPlanning.get == ((1, 3)))
    both("miss", col("ts") === lit("2025-01-01 00:00:00").cast("timestamp"), Nil)
    both("all", col("ts").isNotNull, Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("kill-switch and unfiltered scans stay fully correct") {
    val path = freshDir("ice_mfprune_full")
    Iceberg.write(df((1, 1L, "a")), path, partitionBy = Seq("p"))
    Iceberg.write(df((2, 2L, "b")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    val (lz, eg) = collectBoth(path, identity)
    assert(lz == eg && lz.size == 2)
    // no filter -> nothing pruned, all manifests fetched
    assert(lastLazyPlanning.get == ((2, 2)))
  }

  test("merge-on-read DV debt (v3): data manifests stay lazily pruned, deletes stay exact") {
    val path = freshDir("ice_mfprune_mor_dv")
    Iceberg.write(df((1, 10L, "a"), (1, 11L, "b")), path, partitionBy = Seq("p"))
    Iceberg.upgradeToV3(spark, path)
    Iceberg.write(df((4, 12L, "c"), (4, 13L, "d")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    Iceberg.write(df((8, 14L, "e"), (8, 15L, "f")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    // a deletion vector on partition 4's file, then MORE data appended
    // AFTER the delete — the interleaved busy-table shape the sequence
    // rule exists for (the appended file's path postdates the DV)
    Iceberg.deleteMergeOnRead(spark, path, col("k") === 12L)
    assert(Iceberg.snapshot(spark, path).dvDeletes.nonEmpty,
      "v3 merge-on-read delete must land as a puffin deletion vector")
    Iceberg.write(df((9, 16L, "g")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    // filtered probe: ONLY the matching data manifest is fetched even
    // though delete debt is outstanding (delete manifests load eagerly)
    val (lz, eg) = collectBoth(path, _.filter(col("p") === 8).select(col("v")))
    assert(lz == eg && lz == Seq("e", "f"))
    val (fetched, total) = lastLazyPlanning.get
    assert(total == 4 && fetched == 1,
      s"DV-debted probe planned ($fetched, $total): delete debt must not force the eager walk")
    // the eager A/B run records symmetric introspection: (total, total)
    assert(lastEagerPlanning.get == ((4, 4)),
      s"eager walk must record (total, total), saw $lastEagerPlanning")
    // full scan: deleted row gone, late append present, on BOTH paths
    val (lzAll, egAll) = collectBoth(path, identity)
    assert(lzAll == egAll && lzAll.size == 6 && !lzAll.exists(_.startsWith("12|")),
      s"full MoR scan rows: $lzAll")
  }

  test("merge-on-read v2 position-delete debt: wildcard pairing under interleaved appends") {
    val path = freshDir("ice_mfprune_mor_v2")
    Iceberg.write(df((1, 10L, "a"), (1, 11L, "b")), path, partitionBy = Seq("p"))
    Iceberg.write(df((4, 12L, "c"), (4, 13L, "d")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    Iceberg.write(df((8, 14L, "e"), (8, 15L, "f")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    // one delete spanning TWO partitions' files (one wildcard, many
    // targets), then an append, then a SECOND delete (two wildcards)
    Iceberg.deleteMergeOnRead(spark, path, col("k").isin(10L, 14L))
    assert(Iceberg.snapshot(spark, path).deletes.nonEmpty,
      "v2 merge-on-read delete must land as a position-delete parquet")
    Iceberg.write(df((9, 16L, "g"), (9, 17L, "h")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    Iceberg.deleteMergeOnRead(spark, path, col("k") === 16L)
    // filtered probe on the partition holding a deleted row: exact and
    // lazily planned (1 data manifest of 4)
    val (lz, eg) = collectBoth(path, _.filter(col("p") === 8).select(col("v")))
    assert(lz == eg && lz == Seq("f"), s"deleted row must not surface: $lz")
    val (fetched, total) = lastLazyPlanning.get
    assert(total == 4 && fetched == 1, s"pos-delete-debted probe planned ($fetched, $total)")
    // probe on the post-delete append: its row deleted by the SECOND
    // delete only, first delete's parquet never misapplies to it
    val (lz9, eg9) = collectBoth(path, _.filter(col("p") === 9).select(col("v")))
    assert(lz9 == eg9 && lz9 == Seq("h"))
    // full scan bit-equality
    val (lzAll, egAll) = collectBoth(path, identity)
    assert(lzAll == egAll && lzAll.size == 5, s"full scan rows: $lzAll")
  }

  test("equality-delete debt: bounds-classified groups plan lazily and version-sequence exactly") {
    import spark.implicits._
    val path = freshDir("ice_mfprune_mor_eq")
    Iceberg.write(df((1, 10L, "a"), (2, 11L, "b")), path, partitionBy = Seq("p"))
    Iceberg.write(df((4, 12L, "c")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    Iceberg.deleteEquality(spark, path, Seq(11L).toDF("k"))
    // a row with the deleted key appended AFTER the delete: the
    // version-sequenced semantics (delete applies only to STRICTLY
    // older data sequences)
    Iceberg.write(df((5, 11L, "z")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    val (lz, eg) = collectBoth(path, identity)
    assert(lz == eg && lz.size == 3 && lz.exists(_.startsWith("11|z")),
      s"re-inserted key must survive: $lz")
    // every manifest's [min_seq, seq] bounds sit wholly on one side of
    // the delete's sequence number, so NO manifest was fetched for
    // group assignment — and a partition probe fetches ONLY its own
    // manifest (1 of 3) even with the equality debt outstanding
    val (lzP, egP) = collectBoth(path, _.filter(col("p") === 4).select(col("v")))
    assert(lzP == egP && lzP == Seq("c"), s"partition probe under eq debt: $lzP")
    assert(lastLazyPlanning.contains((1, 3)),
      s"eq-debted probe must stay manifest-list-pruned, planned $lastLazyPlanning")
  }

  test("equality-delete debt: a straddling merged manifest is fetched and grouped per-file") {
    import spark.implicits._
    val path = freshDir("ice_mfprune_mor_eq_straddle")
    Iceberg.write(df((1, 10L, "a")), path, partitionBy = Seq("p"))
    Iceberg.write(df((2, 11L, "b")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    Iceberg.deleteEquality(spark, path, Seq(11L).toDF("k"))
    Iceberg.write(df((5, 11L, "z")), path, partitionBy = Seq("p"),
      mode = org.apache.spark.sql.SaveMode.Append)
    // bin-pack ALL data manifests into one: its [min_seq, seq] bounds
    // now STRADDLE the delete's sequence number, so group assignment
    // needs the per-file sequence numbers — the planner must fetch it
    // eagerly and still version-sequence exactly (pre-delete 11|b
    // deleted, post-delete 11|z kept)
    val (before, after) = Iceberg.rewriteManifests(spark, path,
      targetSizeBytes = Some(1L << 30))
    assert(before == 3 && after == 1, s"bin-pack: $before -> $after")
    val (lz, eg) = collectBoth(path, identity)
    assert(lz == eg && lz.size == 2 && lz.exists(_.startsWith("11|z")) &&
      !lz.exists(_.startsWith("11|b")),
      s"straddler per-file grouping must stay version-sequenced: $lz")
  }
}
