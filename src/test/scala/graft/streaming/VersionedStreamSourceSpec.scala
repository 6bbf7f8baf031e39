package graft.streaming

import graft.SparkFixture
import graft.ingest.{Versioned, Writers}
import java.nio.file.Paths
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** The `graft-versioned` streaming SOURCE (org.apache.spark.sql.graft):
  * offsets are version numbers, each micro-batch reads exactly the data
  * files the version range appended — the table-format tail-the-log
  * contract, checkpointed by the engine. */
class VersionedStreamSourceSpec extends AnyFunSuite with SparkFixture {

  private def freshDir(name: String): String = {
    val p = Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name)
    Writers.deleteTree(p)
    p.toString
  }

  private def runTail(tbl: String, ckpt: String, sink: String,
      ignoreChanges: Boolean = false): Unit = {
    val reader = spark.readStream.format("graft-versioned").option("path", tbl)
    val src = (if (ignoreChanges) reader.option("ignoreChanges", "true") else reader).load()
    val q = src.writeStream
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("tails an append history incrementally: each run reads ONLY the new versions' files") {
    import spark.implicits._
    val base = freshDir("vss_tail")
    val tbl = s"$base/tbl"; val ckpt = s"$base/ckpt"; val sink = s"$base/sink"
    Versioned.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), tbl)
    Versioned.appendCommit(Seq((3L, "c")).toDF("k", "v"), tbl)
    runTail(tbl, ckpt, sink)
    val got1 = spark.read.parquet(sink).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got1 == Map(1L -> "a", 2L -> "b", 3L -> "c"), s"first tail wrong: $got1")
    // second run from the SAME checkpoint: only the new version streams
    Versioned.appendCommit(Seq((4L, "d")).toDF("k", "v"), tbl)
    runTail(tbl, ckpt, sink)
    val got2 = spark.read.parquet(sink).collect().map(r => r.getLong(0) -> r.getString(1))
    assert(got2.length == 4, s"incremental tail re-emitted or dropped rows: ${got2.toSeq}")
    assert(got2.toMap.contains(4L))
    // third run with NO new commits: nothing new lands
    runTail(tbl, ckpt, sink)
    assert(spark.read.parquet(sink).count() == 4, "an idle tail must emit nothing")
  }

  test("a rewrite in the window fails loudly; ignoreChanges re-emits the rewritten files") {
    import spark.implicits._
    val base = freshDir("vss_rewrite")
    val tbl = s"$base/tbl"; val ckpt = s"$base/ckpt"; val sink = s"$base/sink"
    Versioned.appendCommit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), tbl)
    runTail(tbl, ckpt, sink)
    assert(spark.read.parquet(sink).count() == 2)
    Versioned.upsert(spark, tbl, Seq((2L, "b2")).toDF("k", "v"), "k") // rewrite
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      runTail(tbl, ckpt, sink))
    assert(e.getMessage.contains("rewrite") || e.getCause.getMessage.contains("rewrite"),
      s"expected the append-only violation to surface, got: ${e.getMessage}")
    // ignoreChanges: the rewritten version's files stream (re-delivery
    // semantics — both keys reappear with post-rewrite values)
    runTail(tbl, ckpt, sink, ignoreChanges = true)
    val after = spark.read.parquet(sink).collect().map(r => r.getLong(0) -> r.getString(1))
    assert(after.length == 4 && after.count(_ == (2L -> "b2")) == 1,
      s"ignoreChanges must re-emit the rewritten files (re-delivery): ${after.toSeq}")
  }

  test("schema comes from the table's recorded metadata; guards fail at plan time") {
    import spark.implicits._
    val base = freshDir("vss_guards")
    val tbl = s"$base/tbl"
    Versioned.commit(Seq((1L, "a", 0.5)).toDF("k", "v", "score"), tbl)
    val src = spark.readStream.format("graft-versioned").option("path", tbl).load()
    assert(src.schema.fieldNames.toSeq == Seq("k", "v", "score"),
      "source must resolve the schema from _meta without a data read")
    assert(src.isStreaming)
    // a missing path option or an uncommitted table fails at plan time
    intercept[IllegalArgumentException](
      spark.readStream.format("graft-versioned").load())
    intercept[IllegalArgumentException](
      spark.readStream.format("graft-versioned").option("path", s"$base/nope").load())
  }

  test("a Hive-partitioned append log streams with typed partition values injected") {
    import spark.implicits._
    val base = freshDir("vss_parts")
    val tbl = s"$base/tbl"; val ckpt = s"$base/ckpt"; val sink = s"$base/sink"
    Versioned.commitPartitioned(
      Seq((1L, "a", "P1"), (2L, "b", "P2")).toDF("k", "v", "pt"), tbl, "pt") // v1
    Versioned.appendCommitPartitioned(
      Seq((3L, "c", "P1"), (4L, "d", "P3")).toDF("k", "v", "pt"), tbl) // v2: 2 partitions
    runTail(tbl, ckpt, sink)
    val got = spark.read.parquet(sink).as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "a", "P1"), (2L, "b", "P2"), (3L, "c", "P1"), (4L, "d", "P3")),
      s"partitioned tail lost rows or partition values: $got")
    // incremental: only the new version's partitions stream
    Versioned.appendCommitPartitioned(Seq((5L, "e", "P2")).toDF("k", "v", "pt"), tbl) // v3
    runTail(tbl, ckpt, sink)
    assert(spark.read.parquet(sink).count() == 5)
    // the appended files joined the manifest with their fragments: a
    // partition-scoped library read sees them
    val p1 = Versioned.readPartitions(spark, tbl, "pt", Set("P1"))
      .as[(Long, String, String)].collect().map(_._1).sorted.toSeq
    assert(p1 == Seq(1L, 3L))
  }

  test("startingVersion skips the backlog for a fresh stream; checkpoints still win") {
    import spark.implicits._
    val base = freshDir("vss_startver")
    val tbl = s"$base/tbl"; val sink = s"$base/sink"
    Versioned.appendCommit(Seq((1L, "a")).toDF("k", "v"), tbl)
    Versioned.appendCommit(Seq((2L, "b")).toDF("k", "v"), tbl)
    Versioned.appendCommit(Seq((3L, "c")).toDF("k", "v"), tbl)
    val q = spark.readStream.format("graft-versioned")
      .option("path", tbl).option("startingVersion", "3").load()
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.parquet(sink).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(3L), s"startingVersion=3 must emit only v3's rows: $got")
    // the same checkpoint then tails incrementally as usual
    Versioned.appendCommit(Seq((4L, "d")).toDF("k", "v"), tbl)
    runTail(tbl, s"$base/ckpt", sink)
    assert(spark.read.parquet(sink).collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
  }

  test("maxVersionsPerBatch drains a backlog in bounded, checkpointable steps") {
    import spark.implicits._
    val base = freshDir("vss_maxver")
    val tbl = s"$base/tbl"; val sink = s"$base/sink"
    for (i <- 1 to 4)
      Versioned.appendCommit(Seq((i.toLong, s"w$i")).toDF("k", "v"), tbl)
    val q = spark.readStream.format("graft-versioned")
      .option("path", tbl).option("maxVersionsPerBatch", "1").load()
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // every row lands…
    assert(spark.read.parquet(sink).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    // …across 4 bounded batches, not one giant catch-up batch
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches == 4,
      s"expected 4 one-version batches, got $dataBatches: " +
        q.recentProgress.map(p => s"${p.batchId}:${p.numInputRows}").mkString(", "))
  }

  test("the sink-to-source loop closes: stream INTO the table, stream OUT of it, same rows") {
    import spark.implicits._
    val base = freshDir("vss_loop")
    val tbl = s"$base/tbl"; val ckpt = s"$base/ckpt"; val sink = s"$base/sink"
    // producer: micro-batches land via the exactly-once sink idiom (t10)
    for ((batch, id) <- Seq(Seq((1L, "a"), (2L, "b")), Seq((3L, "c"))).zipWithIndex)
      Versioned.appendCommitOnce(batch.toDF("k", "v"), tbl, id.toString)
    // consumer: tail the same table as a stream
    runTail(tbl, ckpt, sink)
    val out = spark.read.parquet(sink).collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(1L, 2L, 3L), s"sink→source loop lost rows: $out")
  }

  test("a filtered tail plans micro-batches from manifest stats: pruned files never stream") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = freshDir("vss_stats")
    val tbl = s"$base/tbl"; val ckpt = s"$base/ckpt"; val sink = s"$base/sink"
    // four one-file appends covering disjoint k ranges, stats at commit
    for (lo <- Seq(0L, 100L, 200L, 300L))
      Versioned.appendCommit(
        (lo until lo + 100L).map(k => (k, s"r$k")).toDF("k", "v").coalesce(1),
        tbl, statsCols = Seq("k"))
    assert(Versioned.manifest(tbl, 4L).forall(_.stats.isDefined))
    val q = spark.readStream.format("graft-versioned")
      .option("path", tbl)
      .option("statsFilterColumn", "k")
      .option("statsFilterLower", "250")
      .option("statsFilterUpper", "399")
      .load()
      .filter(col("k") >= 250L && col("k") <= 399L)
      .writeStream
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // rows exact (the row filter's job)…
    assert(spark.read.parquet(sink).collect().map(_.getLong(0)).sorted.toSeq ==
      (250L to 399L), "filtered tail lost or duplicated rows")
    // …and the plan pruned: the batch's REAL executed plan (foreachBatch
    // frames are LogicalRDD-wrapped, hence StreamIntrospect) scanned
    // only the two files whose stats reach [250, 399]
    val scanned = org.apache.spark.sql.graft.StreamIntrospect.lastBatchInputFiles(q)
      .filter(_.contains("/tbl/"))
    assert(scanned.length == 2, s"expected the batch to scan exactly 2 of 4 files: $scanned")
    // a tail WITHOUT the filter options scans everything — the pruning
    // really is the stats filter's doing
    val q2 = spark.readStream.format("graft-versioned").option("path", tbl).load()
      .writeStream.format("parquet")
      .option("path", s"$base/sink2").option("checkpointLocation", s"$base/ckpt2")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(org.apache.spark.sql.graft.StreamIntrospect.lastBatchInputFiles(q2)
      .count(_.contains("/tbl/")) == 4)
  }

  test("CDF mode streams per-commit change rows, checkpointed exactly-once") {
    import spark.implicits._
    val base = freshDir("vss_cdf")
    val tbl = s"$base/tbl"; val ckpt = s"$base/ckpt"; val sink = s"$base/sink"
    Versioned.commit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), tbl) // v1
    Versioned.upsert(spark, tbl, Seq((2L, "B2"), (9L, "i")).toDF("k", "v"), "k") // v2
    Versioned.deleteMergeOnRead(spark, tbl, Seq(1L).toDF("k"), "k") // v3

    // schema resolves BEFORE the stream runs, from the table metadata
    val src = spark.readStream.format("graft-versioned")
      .option("path", tbl).option("readChangeFeed", "true").option("keyColumn", "k").load()
    assert(src.isStreaming)
    assert(src.schema.fieldNames.toSeq ==
      Seq("commit_version", "k", "change_type", "schema_change", "v"))

    def pump(): Unit = {
      val q = spark.readStream.format("graft-versioned")
        .option("path", tbl).option("readChangeFeed", "true").option("keyColumn", "k")
        .option("maxVersionsPerBatch", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    pump()
    def rows = spark.read.parquet(sink)
      .select("commit_version", "change_type", "k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._3)).toSeq
    val first = rows
    assert(first == Seq(
      (1L, "insert", 1L, "a"), (1L, "insert", 2L, "b"), (1L, "insert", 3L, "c"),
      (2L, "update", 2L, "B2"), (2L, "insert", 9L, "i"),
      (3L, "delete", 1L, "a")), s"CDF stream wrong: $first")
    pump() // idle restart from the checkpoint: nothing may land
    assert(rows == first, "an idle CDF tail re-emitted change rows")
    Versioned.appendCommit(Seq((10L, "j")).toDF("k", "v"), tbl) // v4
    pump() // only the new version's feed streams
    assert(rows == first :+ ((4L, "insert", 10L, "j")),
      "the incremental CDF batch must be exactly v4's inserts")
  }

  test("sink: writeStream.format lands micro-batches as idempotent manifest commits") {
    import spark.implicits._
    val base = freshDir("vsk_sink")
    val src = s"$base/src"; val dst = s"$base/dst"; val ckpt = s"$base/ckpt"
    Versioned.appendCommit(Seq((1L, 10L), (2L, 20L)).toDF("k", "v"), src)
    Versioned.appendCommit(Seq((3L, 30L)).toDF("k", "v"), src)

    def pump(): Unit = {
      val q = spark.readStream.format("graft-versioned").option("path", src)
        .option("maxVersionsPerBatch", "1").load()
        .writeStream.format("graft-versioned")
        .option("path", dst).option("sinkId", "t")
        .option("statsCols", "k")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    pump()
    // two source versions, one per micro-batch → two sink commits
    assert(Versioned.currentVersion(dst).contains(2L),
      s"expected 2 sink commits, got ${Versioned.currentVersion(dst)}")
    assert(Versioned.read(spark, dst).as[(Long, Long)].collect().sorted.toSeq ==
      Seq((1L, 10L), (2L, 20L), (3L, 30L)))

    // engine layer: a checkpoint restart with no new data commits nothing
    pump()
    assert(Versioned.currentVersion(dst).contains(2L), "idle restart must not commit")

    // application layer: a replayed (sinkId, batchId) pair is a no-op
    // even with a non-empty frame — the crash-between-commit-and-
    // checkpoint window streaming sinks must absorb
    Versioned.appendCommitOnce(Seq((99L, 990L)).toDF("k", "v"), dst, "t#1")
    assert(Versioned.currentVersion(dst).contains(2L),
      "replayed sink batch id committed twice — exactly-once broken")

    // statsCols rode through: every sink file carries k min/max, so a
    // filtered batch read over dst prunes files at planning
    assert(Versioned.manifest(dst, 2L).forall(_.stats.nonEmpty),
      "sink files must carry the requested per-file stats")

    // incremental: only the new source version lands on the next pump
    Versioned.appendCommit(Seq((4L, 40L)).toDF("k", "v"), src)
    pump()
    assert(Versioned.currentVersion(dst).contains(3L))
    assert(Versioned.read(spark, dst).count() == 4)
  }

  test("sink: update output mode and partitionBy are refused") {
    import spark.implicits._
    val base = freshDir("vsk_refuse")
    val src = s"$base/src"
    Versioned.appendCommit(Seq((1L, "a")).toDF("k", "v"), src)
    val e = intercept[Exception] {
      spark.readStream.format("graft-versioned").option("path", src).load()
        .writeStream.format("graft-versioned")
        .option("path", s"$base/dst").option("checkpointLocation", s"$base/ckpt")
        .outputMode("update")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("Append output mode")) ||
      msgs(e).exists(_.contains("does not support Update")) ||
      msgs(e).exists(_.contains("only Append")), s"unexpected refusal: ${msgs(e)}")
  }

  test("a fresh CDF stream on a vacuumed table bootstraps at the retention floor") {
    import spark.implicits._
    val base = freshDir("vss_cdf_vacuum")
    val tbl = s"$base/tbl"; val ckpt = s"$base/ckpt"; val sink = s"$base/sink"
    Versioned.commit(Seq((1L, "a")).toDF("k", "v"), tbl)                  // v1
    Versioned.upsert(spark, tbl, Seq((1L, "a2"), (2L, "b")).toDF("k", "v"), "k") // v2
    Versioned.appendCommit(Seq((3L, "c")).toDF("k", "v"), tbl)            // v3
    Versioned.vacuum(tbl, keepLast = 2) // v1 gone: retention floor is now v2
    assert(Versioned.versions(tbl) == Seq(2L, 3L))
    // a FRESH unwindowed CDF stream must not ask for changes below the
    // floor (from=0 would drive changeFeed(1, …) into its retention
    // require) — it bootstraps v2's snapshot as inserts, then v3's feed
    val q = spark.readStream.format("graft-versioned")
      .option("path", tbl).option("readChangeFeed", "true").option("keyColumn", "k")
      .load()
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.read.parquet(sink)
      .select("commit_version", "change_type", "k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._3)).toSeq
    assert(rows == Seq(
      (2L, "insert", 1L, "a2"), (2L, "insert", 2L, "b"),
      (3L, "insert", 3L, "c")), s"vacuumed-table CDF bootstrap wrong: $rows")
  }
}
