package graft.interop

import org.apache.spark.sql.{DataFrame, SaveMode, SQLContext}
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.DataSourceUtils
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{
  BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider,
  StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** `spark.read.format("iceberg")` / `df.write.format("iceberg")` over
  * [[Iceberg]] — the familiar surface for users coming from Iceberg,
  * resolvable because no Iceberg jar is on the classpath to claim the
  * short name. Read option: `snapshotId` (time travel). Write modes:
  * overwrite/append with `.partitionBy(...)` (identity transforms). */
final class IcebergSourceProvider extends RelationProvider
    with CreatableRelationProvider with StreamSourceProvider with StreamSinkProvider
    with DataSourceRegister {

  /** Streaming sink: `df.writeStream.format("iceberg").start(tbl)` —
    * summary-property exactly-once (see
    * [[org.apache.spark.sql.graft.IcebergSink]]). Append mode only. */
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val path = pathOf(parameters)
    require(outputMode == OutputMode.Append(),
      s"iceberg sink: only Append output mode is supported ($outputMode given)")
    // no shared default appId — see the delta sink's reasoning
    val appId = opt(parameters, "appId")
      .orElse(opt(parameters, "checkpointLocation").map("ckpt:" + _))
      .getOrElse(throw new IllegalArgumentException(
        "iceberg sink: set option(\"appId\", ...) — or pass checkpointLocation " +
          "as a writer option — so exactly-once epochs are scoped per query"))
    new org.apache.spark.sql.graft.IcebergSink(path, appId, partitionColumns)
  }

  override def shortName(): String = "iceberg"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase("path") => v }
      .getOrElse(throw new IllegalArgumentException("iceberg: 'path' is required"))

  /** Streaming read: `spark.readStream.format("iceberg").load(tbl)` —
    * tails the snapshot log (sequence numbers as offsets). Option:
    * `ignoreChanges` (re-emit overwrite snapshots instead of failing). */
  private def wantsChangelog(parameters: Map[String, String]): Boolean =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("changelog") => v.toBoolean
    }.getOrElse(false)

  private def changelogSchema(base: StructType): StructType =
    org.apache.spark.sql.types.StructType(base.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_sequence_number",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_snapshot_id",
        org.apache.spark.sql.types.LongType)))

  /** The tail's serving schema: the newest schema-tracking entry when
    * `schemaTrackingLocation` is set and has recorded one (the
    * restart-after-evolution path), else the current snapshot's. */
  private def tailSchema(sqlContext: SQLContext,
      parameters: Map[String, String]): StructType =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("schemaTrackingLocation") => v
    }.flatMap(org.apache.spark.sql.graft.StreamSchemaTracking.read(_).map(_._1))
      .getOrElse(Iceberg.snapshot(sqlContext.sparkSession, pathOf(parameters)).schema)

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    ("iceberg", schema.getOrElse {
      val base = tailSchema(sqlContext, parameters)
      if (wantsChangelog(parameters)) changelogSchema(base) else base
    })

  override def createSource(
      sqlContext: SQLContext, metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source = {
    val path = pathOf(parameters)
    val snap = Iceberg.snapshot(sqlContext.sparkSession, path)
    if (wantsChangelog(parameters))
      return new org.apache.spark.sql.graft.IcebergChangelogSource(
        sqlContext.sparkSession.asInstanceOf[ClassicSession], path,
        schema.getOrElse(changelogSchema(snap.schema)),
        parameters.collectFirst {
          case (k, v) if k.equalsIgnoreCase("fromSeq") => v.toLong
        })
    val tracking = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("schemaTrackingLocation") => v
    }
    val pinned = schema.getOrElse(
      tracking.flatMap(org.apache.spark.sql.graft.StreamSchemaTracking.read(_).map(_._1))
        .getOrElse(snap.schema))
    // first start under tracking: put the serving schema on disk
    // before any evolution can land
    tracking.foreach(dir => org.apache.spark.sql.graft.StreamSchemaTracking.record(
      dir, pinned, snap.sequenceNumber))
    new org.apache.spark.sql.graft.IcebergStreamSource(
      sqlContext.sparkSession.asInstanceOf[ClassicSession], path,
      pinned, snap.partitionColumns,
      ignoreChanges = parameters.collectFirst {
        case (k, v) if k.equalsIgnoreCase("ignoreChanges") => v.toBoolean
      }.getOrElse(false),
      schemaTracking = tracking)
  }

  private def opt(parameters: Map[String, String], name: String): Option[String] =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }

  override def createRelation(
      sqlContext: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val path = pathOf(parameters)
    def inspection(df: org.apache.spark.sql.DataFrame): BaseRelation = {
      val outer = sqlContext
      new BaseRelation with org.apache.spark.sql.sources.TableScan {
        override val sqlContext: SQLContext = outer
        override val schema = df.schema
        override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = df.rdd
      }
    }
    if (opt(parameters, "history").exists(_.toBoolean))
      return inspection(Iceberg.history(sqlContext.sparkSession, path))
    // the changelog read: fromSeq (exclusive) .. toSeq (inclusive,
    // default current) — the mirror of delta's readChangeFeed
    if (opt(parameters, "changelog").exists(_.toBoolean)) {
      val from = opt(parameters, "fromSeq").map(_.toLong).getOrElse(0L)
      val toS = opt(parameters, "toSeq").map(_.toLong)
      return inspection(Iceberg.changeLog(sqlContext.sparkSession, path, from, toS))
    }
    if (opt(parameters, "manifests").exists(_.toBoolean))
      return inspection(Iceberg.manifestsTable(sqlContext.sparkSession, path))
    if (opt(parameters, "snapshots").exists(_.toBoolean))
      return inspection(Iceberg.snapshotsTable(sqlContext.sparkSession, path))
    if (opt(parameters, "refs").exists(_.toBoolean))
      return inspection(Iceberg.refsTable(sqlContext.sparkSession, path))
    if (opt(parameters, "files").exists(_.toBoolean))
      return inspection(Iceberg.files(sqlContext.sparkSession, path))
    if (opt(parameters, "delete_files").exists(_.toBoolean))
      return inspection(Iceberg.deleteFilesTable(sqlContext.sparkSession, path))
    if (opt(parameters, "partitions").exists(_.toBoolean))
      return inspection(Iceberg.partitions(sqlContext.sparkSession, path))
    val snapshotId = opt(parameters, "snapshotId").map(_.toLong)
      .orElse(opt(parameters, "tag").orElse(opt(parameters, "branch")).map { n =>
        Iceberg.refs(path).getOrElse(n, throw new IllegalArgumentException(
          s"iceberg: no ref '$n' on $path"))._1
      })
      .orElse(opt(parameters, "asOfTimestamp").map { ts =>
        Iceberg.snapshotAsOf(path, java.sql.Timestamp.valueOf(ts).getTime)
      })
    // v3 row lineage as a read option: the table's columns plus
    // _row_id / _last_updated_sequence_number
    if (opt(parameters, "rowLineage").exists(_.toBoolean))
      return inspection(
        Iceberg.readWithRowLineage(sqlContext.sparkSession, path, snapshotId))
    Iceberg.relationFor(sqlContext.sparkSession, path, snapshotId)
  }

  override def createRelation(
      sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val path = pathOf(parameters)
    val partitionBy: Seq[String] = parameters
      .collectFirst {
        case (k, v) if k.equalsIgnoreCase(DataSourceUtils.PARTITIONING_COLUMNS_KEY) =>
          DataSourceUtils.decodePartitioningColumns(v)
      }
      .getOrElse(Seq.empty)
    val exists = Iceberg.isIcebergTable(path)
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalArgumentException(s"iceberg: $path already exists (mode=errorifexists)")
      case SaveMode.Ignore if exists => ()
      case SaveMode.Append if exists =>
        Iceberg.write(data, path, partitionBy, SaveMode.Append,
          mergeSchema = opt(parameters, "mergeSchema").exists(_.toBoolean)): Unit
      case _ =>
        Iceberg.write(data, path, partitionBy, SaveMode.Overwrite): Unit
    }
    createRelation(sqlContext, parameters)
  }
}
