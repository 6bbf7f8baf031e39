/* Shim-packaged like the Delta/versioned stream sources (the
 * isStreaming LogicalRelation constructor is private[sql]). */
package org.apache.spark.sql.graft

import graft.interop.Iceberg

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.{DataSource, LogicalRelation}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.types.StructType

/** Streaming SOURCE over an Iceberg table's snapshot log —
  * `spark.readStream.format("iceberg").load(tbl)` with this library's
  * from-spec layout: offsets are SEQUENCE NUMBERS (monotonic, durable,
  * replayable); a fresh stream's first batch is the current snapshot's
  * live file set, every later batch reads exactly the manifests the
  * new snapshots added — O(new data) per batch, no directory listing.
  * A non-append snapshot (overwrite) fails loudly unless
  * `ignoreChanges=true` re-emits its added files. */
class IcebergStreamSource(
    spark: ClassicSession,
    path: String,
    override val schema: StructType,
    partCols: Seq[String],
    ignoreChanges: Boolean,
    // same contract as the Delta tail ([[StreamSchemaTracking]]): a
    // mid-stream additive evolution records the new schema and fails
    // the query once; the restart resumes under the evolved schema
    schemaTracking: Option[String] = None,
) extends Source {

  override def getOffset: Option[OffsetV1] = {
    // the MAIN head's sequence — the global counter also advances on
    // branch (WAP) writes, and jumping past an unpublished staged
    // commit would skip its rows at fastForward time
    val seq = Iceberg.currentMainSequence(path)
    if (seq == 0L) None else Some(LongOffset(seq))
  }

  private def seqOf(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case other         => other.json.trim.toLong
  }

  private def emptyBatch(): DataFrame = {
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    spark.internalCreateDataFrame(empty.queryExecution.toRdd, schema, isStreaming = true)
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val to = seqOf(end)
    val files: Seq[Iceberg.DataFileRef] = start match {
      case None => // bootstrap: the snapshot AT the end offset — the
        // live set could already include commits past `to`, which the
        // next batch would then re-deliver
        val snapId = Iceberg.snapshotIdAtSeq(path, to)
        if (snapId.isEmpty) return emptyBatch()
        val snap = Iceberg.snapshot(spark, path, snapId)
        // raw file unions cannot subtract position-delete rows — a
        // bootstrap over outstanding delete debt would over-serve
        // deleted rows. Refuse rather than misread; a rewrite
        // (copy-on-write delete / compaction) clears the debt.
        if (snap.hasDeleteDebt)
          throw new IllegalStateException(
            s"iceberg source: $path carries ${snap.deletes.size} position-delete, " +
              s"${snap.eqDeletes.size} equality-delete file(s) and ${snap.dvDeletes.size} " +
              "deletion vector(s) — a streaming bootstrap over merge-on-read delete debt " +
              "would re-serve deleted rows. Rewrite the table (copy-on-write delete or " +
              "compaction) before tailing it.")
        snap.files
      case Some(s0) =>
        // mid-stream SCHEMA EVOLUTION gate — the Delta tail's contract
        // on the Iceberg snapshot log (older-subset declarations are
        // the post-restart replay case and serve under the pinned
        // schema, absent columns null-filling)
        Iceberg.schemaChangeBetween(path, seqOf(s0), to)
          .filter(ns => StreamSchemaTracking.canonical(ns) !=
            StreamSchemaTracking.canonical(schema))
          .filterNot(ns => StreamSchemaTracking.isAdditive(ns, schema))
          .foreach { ns =>
            schemaTracking match {
              case Some(dir) =>
                require(StreamSchemaTracking.isAdditive(schema, ns),
                  s"iceberg source: sequence window (${seqOf(s0)}, $to] of $path evolves " +
                    "the schema NON-additively — a tail cannot re-serve history under " +
                    "dropped/renamed/retyped columns; restart fresh from the current snapshot")
                StreamSchemaTracking.record(dir, ns, to)
                throw new IllegalStateException(
                  s"iceberg source: schema of $path changed in sequence window " +
                    s"(${seqOf(s0)}, $to] (additive). The evolved schema has been recorded " +
                    "in the schema-tracking location — RESTART the stream to continue; it " +
                    "will resume from the checkpoint serving the new schema.")
              case None =>
                throw new IllegalStateException(
                  s"iceberg source: schema of $path changed in sequence window " +
                    s"(${seqOf(s0)}, $to] — a running tail is pinned to the schema at " +
                    "stream start. Set option(\"schemaTrackingLocation\", <dir>) to let " +
                    "the stream record evolutions and resume through restarts, or " +
                    "restart fresh from the current snapshot.")
            }
          }
        val (adds, nonAppend) = Iceberg.changesBetween(spark, path, seqOf(s0), to)
        if (nonAppend && !ignoreChanges)
          throw new IllegalStateException(
            s"iceberg source: sequence (${seqOf(s0)}, $to] of $path contains a non-append " +
              "snapshot (overwrite) — a streaming tail of an append log cannot represent " +
              "it. Restart from the current snapshot, or set ignoreChanges=true to re-emit " +
              "the snapshot's files (downstream must tolerate re-delivery).")
        adds
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
    if (partCols.isEmpty)
      streamRelation(files.map(f => new java.net.URI(f.path).getPath), schema)
    else {
      import org.apache.spark.sql.functions.{col, lit}
      val dataSchema = StructType(schema.fields.filterNot(f => partCols.contains(f.name)))
      val frames = files.groupBy(_.partitionValues).toSeq
        .sortBy(_._1.toSeq.sortBy(_._1).map(kv => kv._1 + "=" + kv._2.getOrElse("")).mkString("/"))
        .map { case (pv, fs) =>
          val base = streamRelation(fs.map(f => new java.net.URI(f.path).getPath), dataSchema)
          val withParts = partCols.foldLeft(base) { (acc, c) =>
            val raw = pv.getOrElse(c, None)
            acc.withColumn(c,
              raw.map(lit(_)).getOrElse(lit(null)).cast(schema(schema.fieldIndex(c)).dataType))
          }
          withParts.select(schema.fieldNames.toIndexedSeq.map(col): _*)
        }
      if (frames.isEmpty) emptyBatch()
      else frames.reduce(_.unionByName(_))
    }
  }

  override def stop(): Unit = ()
}

/** Streaming CHANGELOG source —
  * `spark.readStream.format("iceberg").option("changelog", "true")`:
  * offsets are sequence numbers, and each micro-batch is
  * [[graft.interop.Iceberg.changeLog]] over exactly the newly
  * committed window — insert/delete images with
  * `_change_type`/`_sequence_number`/`_snapshot_id`, the mirror of the
  * delta streaming CDF consumer. `fromSeq` windows the first batch;
  * a fresh unwindowed stream serves new commits only. Compactions are
  * row-neutral and contribute nothing, so a maintenance commit never
  * disturbs a downstream incremental view. */
class IcebergChangelogSource(
    spark: ClassicSession,
    path: String,
    override val schema: StructType,
    fromSeq: Option[Long],
) extends Source {

  override def getOffset: Option[OffsetV1] = {
    val seq = Iceberg.currentMainSequence(path)
    if (seq == 0L) None else Some(LongOffset(seq))
  }

  private def seqOf(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case other         => other.json.trim.toLong
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val to = seqOf(end)
    // changeLog's lower bound is EXCLUSIVE, like the offset contract
    val from = start.map(seqOf)
      .orElse(fromSeq)
      .getOrElse(to) // fresh unwindowed stream: new commits only
    val batch =
      if (from >= to)
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      else Iceberg.changeLog(spark, path, from, Some(to))
    spark.internalCreateDataFrame(batch.queryExecution.toRdd, schema, isStreaming = true)
  }

  override def stop(): Unit = ()
}

/** Streaming SINK over an Iceberg table —
  * `df.writeStream.format("iceberg").start(tbl)`: each micro-batch
  * commits as ONE snapshot whose summary carries the
  * `(streaming-app-id, streaming-epoch-id)` watermark, and `addBatch`
  * skips any batch at-or-below the highest committed epoch — the
  * crash-between-commit-and-checkpoint replay lands exactly once, the
  * same summary-property mechanism the spec's real streaming
  * integrations use. O(new data) per batch: an Iceberg append carries
  * the prior manifests untouched and adds one manifest. */
class IcebergSink(
    path: String, appId: String, partitionBy: Seq[String]) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    if (Iceberg.lastCommittedEpoch(path, appId).exists(_ >= batchId))
      return // replayed batch: already committed exactly once
    val spark = data.sparkSession.asInstanceOf[ClassicSession]
    val batch = spark.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
    Iceberg.write(batch, path, partitionBy, SaveMode.Append,
      summaryProps = Map("streaming-app-id" -> appId,
        "streaming-epoch-id" -> batchId.toString)): Unit
  }

  override def toString: String = s"IcebergSink[$path]"
}
