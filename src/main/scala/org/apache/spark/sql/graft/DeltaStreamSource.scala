/* Shim-packaged for the same reason as VersionedStreamSource: a v1
 * streaming Source must hand MicroBatchExecution a DataFrame whose
 * logical plan is flagged isStreaming, and `Dataset.ofRows(spark,
 * LogicalRelation(relation, isStreaming = true))` is private[sql].
 * Everything else delegates to the public graft.interop.DeltaLake API. */
package org.apache.spark.sql.graft

import graft.interop.DeltaLake

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.{StructField, StructType}

/** The source's SCHEMA-TRACKING log (Delta's documented
  * `schemaTrackingLocation` behavior): a tiny JSON journal under
  * `<dir>/_schema_log/` recording each schema the stream has served
  * and the log version it took effect at. A mid-stream evolution
  * fails the running query ONCE (recording the evolved schema first);
  * the restarted query reads the newest entry and resumes serving the
  * evolved schema — pre-evolution files null-fill the added columns
  * at scan, so the replayed window needs no rewrite. */
object StreamSchemaTracking {
  private lazy val Json = new com.fasterxml.jackson.databind.ObjectMapper()

  private def logDir(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_schema_log")

  def read(dir: String): Option[(StructType, Long)] = {
    val d = logDir(dir)
    val fs = d.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) return None
    val entries = fs.listStatus(d).map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .flatMap(n => n.stripSuffix(".json").toLongOption)
    entries.maxOption.map { v =>
      // the writer claims the entry file EXCLUSIVELY first, then writes
      // the payload ([[record]]) — a reader landing inside that window
      // sees an empty/partial file. Wait the in-flight append out (the
      // same torn-read rule the commit files follow); a claim that
      // never fills is a crashed writer — fail loudly, never serve a
      // torn schema.
      var attempt = 0
      var parsed: Option[(StructType, Long)] = None
      while (parsed.isEmpty) {
        val in = fs.open(new org.apache.hadoop.fs.Path(d, s"$v.json"))
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        parsed =
          try {
            val node = Json.readTree(text)
            if (node == null || !node.hasNonNull("schema") || !node.hasNonNull("deltaVersion"))
              None
            else Some((org.apache.spark.sql.types.DataType.fromJson(node.get("schema").asText)
              .asInstanceOf[StructType], node.get("deltaVersion").asLong))
          } catch { case _: com.fasterxml.jackson.core.JacksonException => None }
        if (parsed.isEmpty) {
          attempt += 1
          if (attempt > 100) throw new IllegalStateException(
            s"schemaTrackingLocation: _schema_log entry $v under $dir never filled — " +
              "a schema-recording writer crashed mid-append; remove the torn entry to recover")
          Thread.sleep(20L)
        }
      }
      parsed.get
    }
  }

  /** Append a schema entry (no-op when the newest entry already equals
    * it — detection can fire once per in-flight batch attempt). The
    * journal slot is claimed with the same EXCLUSIVE-create arbitration
    * the commit files use ([[graft.interop.CommitFiles.createExclusive]]):
    * a rival writer racing for the same `last+1` index loses the kernel
    * O_EXCL claim instead of silently clobbering the winner's entry —
    * if the winner recorded the SAME schema the loser no-ops (both
    * attempts of one evolution), a DIFFERENT schema fails loudly (two
    * checkpoints genuinely disagree about the table's shape). */
  def record(dir: String, schema: StructType, deltaVersion: Long): Unit = {
    if (read(dir).exists { case (s, _) => canonical(s) == canonical(schema) }) return
    val d = logDir(dir)
    val fs = d.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    fs.mkdirs(d)
    val next = fs.listStatus(d).map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .flatMap(n => n.stripSuffix(".json").toLongOption)
      .maxOption.map(_ + 1).getOrElse(0L)
    val node = Json.createObjectNode()
    node.put("schema", schema.json)
    node.put("deltaVersion", deltaVersion)
    val out = try graft.interop.CommitFiles.createExclusive(
      fs, new org.apache.hadoop.fs.Path(d, s"$next.json"))
    catch {
      // ONLY the typed exists-failure is a lost O_EXCL race; a genuine
      // IO failure (disk full, permissions) propagates unchanged
      // instead of masquerading as a shared-tracking-location conflict
      case e @ (_: org.apache.hadoop.fs.FileAlreadyExistsException |
                _: java.nio.file.FileAlreadyExistsException) =>
        // lost the slot: a rival recorded first — same schema is the
        // benign double-fire, anything else is a real conflict
        if (read(dir).exists { case (s, _) => canonical(s) == canonical(schema) }) return
        throw new java.util.ConcurrentModificationException(
          s"schemaTrackingLocation: lost the _schema_log claim for entry $next under $dir " +
            "to a writer recording a DIFFERENT schema — two streams share this tracking " +
            "location; give each checkpoint its own", e)
    }
    try out.write(Json.writeValueAsString(node).getBytes("UTF-8")) finally out.close()
  }

  /** Name+type shape, metadata/nullability-blind — what evolution
    * detection compares. */
  def canonical(s: StructType): Seq[(String, String)] =
    s.fields.toSeq.map(f => (f.name, f.dataType.sql))

  /** Old → new is ADDITIVE when every old column survives with its
    * type — the only evolution the tail auto-resumes through (dropped/
    * renamed/retyped columns would silently mis-serve history). */
  def isAdditive(oldS: StructType, newS: StructType): Boolean = {
    val newCols = canonical(newS).toMap
    canonical(oldS).forall { case (n, t) => newCols.get(n).contains(t) }
  }
}

/** Streaming SOURCE over a Delta table's transaction log —
  * `spark.readStream.format("delta").load(tbl)` with this library's
  * from-spec log implementation: offsets are log versions; a fresh
  * stream's first batch is the CURRENT SNAPSHOT's live file set (the
  * Delta source's documented bootstrap), or the tail from
  * `startingVersion`; every later batch reads exactly the `add`
  * actions of the committed version range — O(new data) per batch at
  * any table size, no directory listing ever.
  *
  * Contract (Delta's): a version carrying `remove` actions (overwrite,
  * delete, compaction) breaks the append-only tail and fails loudly
  * unless `ignoreChanges=true`, which re-emits that version's adds —
  * downstream must tolerate re-delivery. Partition columns are not in
  * the data files; each batch injects them from the log's
  * `partitionValues`, typed through the schema pinned at stream start. */
class DeltaStreamSource(
    spark: ClassicSession,
    path: String,
    override val schema: StructType,
    partCols: Seq[String],
    ignoreChanges: Boolean,
    startingVersion: Option[Long],
    // column-mapping shape pinned at stream start: data files of a
    // mapped table speak PHYSICAL names (stable across later renames),
    // so each batch scans physical and renames to the pinned logical
    rawSchema: StructType = StructType(Nil),
    mapMode: Option[String] = None,
    // Delta's schemaTrackingLocation: when set, a mid-stream additive
    // evolution records the new schema there and fails the query once;
    // the restart resumes under the evolved schema
    schemaTracking: Option[String] = None,
) extends Source {

  // same gate as the batch path: with the conf off, an id-mode scan
  // would silently fall back to (stale) physical-name matching
  if (mapMode.contains("id"))
    require(spark.conf.get("spark.sql.parquet.fieldId.read.enabled", "false") == "true",
      s"delta source: $path uses delta.columnMapping.mode=id — set " +
        "spark.sql.parquet.fieldId.read.enabled=true (at session build) to tail it")

  private val physFields: Seq[StructField] =
    if (mapMode.isEmpty) schema.fields.toSeq
    else DeltaLake.physicalFields(rawSchema, mapMode, path)
  // logical → physical top-level names (identity when unmapped)
  private val physName: Map[String, String] =
    schema.fieldNames.zip(physFields.map(_.name)).toMap

  override def getOffset: Option[OffsetV1] =
    DeltaLake.versions(path).lastOption.map(LongOffset(_))

  private def versionOf(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case other         => other.json.trim.toLong // SerializedOffset after a restart
  }

  private def addsOf(v: Long): Seq[DeltaLake.AddFile] = {
    // mid-stream SCHEMA EVOLUTION gate: a version declaring a schema
    // that differs from the pinned one cannot be served under the
    // pinned shape. With a schemaTrackingLocation, record the evolved
    // schema and fail ONCE — the restarted stream resumes under it
    // (this very check passes then, since pinned == declared); without
    // tracking, refuse with the option spelled out (Delta's documented
    // default).
    DeltaLake.schemaChangeIn(path, v)
      .filter(ns => StreamSchemaTracking.canonical(ns) != StreamSchemaTracking.canonical(schema))
      // a version declaring an OLDER subset of the pinned schema is the
      // RESUME case (post-restart replay across the evolution point):
      // the pinned schema serves those files, added columns null-fill
      .filterNot(ns => StreamSchemaTracking.isAdditive(ns, schema))
      .foreach { ns =>
        schemaTracking match {
          case Some(dir) =>
            require(StreamSchemaTracking.isAdditive(schema, ns),
              s"delta source: version $v of $path evolves the schema NON-additively " +
                s"(${StreamSchemaTracking.canonical(schema)} -> ${StreamSchemaTracking.canonical(ns)}) " +
                "— a tail cannot re-serve history under dropped/renamed/retyped columns; " +
                "restart the stream fresh from the current snapshot")
            StreamSchemaTracking.record(dir, ns, v)
            throw new IllegalStateException(
              s"delta source: schema of $path changed at version $v (additive). The evolved " +
                "schema has been recorded in the schema-tracking location — RESTART the " +
                "stream to continue; it will resume from the checkpoint serving the new schema.")
          case None =>
            throw new IllegalStateException(
              s"delta source: schema of $path changed at version $v — a running tail is " +
                "pinned to the schema at stream start. Set " +
                "option(\"schemaTrackingLocation\", <dir>) to let the stream record " +
                "evolutions and resume through restarts, or restart fresh from the " +
                "current snapshot.")
        }
      }
    val (adds, hasRemoves) = DeltaLake.changesIn(path, v)
    if (hasRemoves && !ignoreChanges)
      throw new IllegalStateException(
        s"delta source: version $v of $path contains remove actions (overwrite/delete/" +
          "compaction) — a streaming tail of an append log cannot represent it. Restart " +
          "from the current snapshot, or set ignoreChanges=true to re-emit the version's " +
          "files (downstream must tolerate re-delivery).")
    // even under ignoreChanges, a DV-carrying add cannot be served as a
    // raw file scan — that would re-deliver the DELETED rows too
    require(adds.forall(_.dv.isEmpty),
      s"delta source: version $v of $path adds deletion-vector files — a file-level " +
        "tail cannot subtract their rows; rewrite the table before tailing past it")
    adds
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val to = versionOf(end)
    val files: Seq[DeltaLake.AddFile] = start match {
      // fresh stream: the live snapshot at `to` (Delta's bootstrap), or
      // the tail from startingVersion (that version INCLUDED)
      case None => startingVersion match {
        case Some(sv) => (sv to to).flatMap(addsOf)
        case None =>
          val snap = DeltaLake.snapshot(spark, path, Some(to))
          require(!snap.hasDeletionVectors,
            s"delta source: $path carries deletion vectors at v$to — a bootstrap over " +
              "merge-on-read delete debt would re-serve deleted rows")
          snap.files
      }
      case Some(s0) => (versionOf(s0) + 1L to to).flatMap(addsOf)
    }
    def streamRelation(paths: Seq[String], fileSchema: StructType): DataFrame = {
      val relation = DataSource(
        sparkSession = spark,
        className = "parquet",
        paths = paths,
        userSpecifiedSchema = Some(fileSchema),
      ).resolveRelation(checkFilesExist = false)
      Dataset.ofRows(spark, LogicalRelation(relation, isStreaming = true))
    }
    if (partCols.isEmpty) {
      import org.apache.spark.sql.functions.col
      val scan = streamRelation(files.map(f => s"$path/${f.path}"),
        StructType(physFields))
      DeltaLake.toLogicalNames(scan, rawSchema, mapMode)
        .select(schema.fieldNames.toIndexedSeq.map(col): _*)
    } else {
      import org.apache.spark.sql.functions.{col, lit}
      val physPartNames = partCols.map(physName)
      val dataSchema = StructType(physFields.filterNot(f => physPartNames.contains(f.name)))
      val frames = files.groupBy(_.partitionValues).toSeq
        .sortBy(_._1.toSeq.sortBy(_._1).map(kv => kv._1 + "=" + kv._2.getOrElse("")).mkString("/"))
        .map { case (pv, fs) =>
          val base = DeltaLake.toLogicalNames(
            streamRelation(fs.map(f => s"$path/${f.path}"), dataSchema), rawSchema, mapMode)
          // the log's partitionValues are keyed by PHYSICAL name
          val withParts = partCols.foldLeft(base) { (acc, c) =>
            val raw = pv.getOrElse(physName(c), None)
            acc.withColumn(c,
              raw.map(lit(_)).getOrElse(lit(null)).cast(schema(schema.fieldIndex(c)).dataType))
          }
          withParts.select(schema.fieldNames.toIndexedSeq.map(col): _*)
        }
      if (frames.isEmpty) {
        val empty = spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        spark.internalCreateDataFrame(empty.queryExecution.toRdd, schema, isStreaming = true)
      } else frames.reduce(_.unionByName(_))
    }
  }

  override def stop(): Unit = ()
}

/** Streaming SINK over a Delta table —
  * `df.writeStream.format("delta").start(tbl)` — with the protocol's
  * EXACTLY-ONCE contract: every batch commit carries a `txn` action
  * `(appId, batchId)`, and `addBatch` first consults the snapshot's
  * latest txn watermark for this appId — a batch at-or-below it is a
  * CHECKPOINT REPLAY after a crash between the table commit and the
  * streaming checkpoint advance, and is skipped instead of
  * double-appended. The watermark folds into checkpoints, so
  * vacuuming the JSON tail never reopens the replay window. `appId`
  * defaults to a hash of the query's checkpointLocation (one sink,
  * one app), overridable via option("txnAppId") when several
  * queries feed one table. */
class DeltaSink(
    path: String, appId: String, partitionBy: Seq[String]) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    if (DeltaLake.isDeltaTable(path) &&
      DeltaLake.snapshot(data.sparkSession, path).txns.get(appId).exists(_ >= batchId))
      return // replayed batch: already committed exactly once
    val spark = data.sparkSession.asInstanceOf[ClassicSession]
    val batch = spark.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
    DeltaLake.write(batch, path, partitionBy, SaveMode.Append,
      txn = Some(appId -> batchId)): Unit
  }

  override def toString: String = s"DeltaSink[$path]"
}

/** Streaming CHANGE-DATA-FEED source —
  * `spark.readStream.format("delta").option("readChangeFeed", "true")`:
  * offsets are log versions; each micro-batch is
  * [[graft.interop.DeltaLake.changeFeed]] over exactly the newly
  * committed version window, so consumers see per-commit row images
  * (`_change_type`, `_commit_version`) instead of file adds. A fresh
  * stream starts after the current version (new changes only) unless
  * `startingVersion` rewinds it; a pre-enablement mutation inside a
  * batch window fails loudly through changeFeed's own gate. */
class DeltaCdfStreamSource(
    spark: ClassicSession,
    path: String,
    override val schema: StructType,
    startingVersion: Option[Long],
) extends Source {

  override def getOffset: Option[OffsetV1] =
    DeltaLake.versions(path).lastOption.map(LongOffset(_))

  private def versionOf(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case other         => other.json.trim.toLong
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val to = versionOf(end)
    val from = start.map(versionOf(_) + 1L)
      .orElse(startingVersion)
      .getOrElse(to + 1L) // fresh unwindowed stream: new commits only
    val batch =
      if (from > to) {
        val empty = spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        empty
      } else DeltaLake.changeFeed(spark, path, from, Some(to))
    spark.internalCreateDataFrame(batch.queryExecution.toRdd, schema, isStreaming = true)
  }

  override def stop(): Unit = ()
}
