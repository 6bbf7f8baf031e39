/* Shim-packaged like the other connector relations: HadoopFsRelation
 * subclassing + Dataset plumbing live inside the Spark namespace. The
 * interop formats' SQL-facing relations are defined here so that
 * `INSERT INTO` a catalog table backed by format("delta") /
 * format("iceberg") lands through the LOG COMMIT PROTOCOL instead of
 * `InsertIntoHadoopFsRelationCommand` dropping raw parquet files into
 * the table root — files the log never records, silently invisible to
 * every read: data loss from the writer's point of view. The
 * InsertableRelation case of DataSourceAnalysis matches first for
 * plain INSERT INTO; the read-only file format below is the backstop
 * for the one shape that still routes to the raw-file command (a
 * static `PARTITION (k=v)` clause), refusing before anything stages. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.types.StructType

/** The merge-on-read fallback relations' SCAN seam: Catalyst hands
  * [[org.apache.spark.sql.sources.PrunedFilteredScan]] the pushed
  * column set and source filters; translating them onto the LIBRARY
  * read frame (whose own pruning FileIndex plans the nested scan)
  * restores partition/stats FILE PRUNING and column pruning while
  * delete debt is outstanding — previously a `TableScan` read every
  * column of every file between a MoR delete and the next compaction,
  * which at 100 TB made delete debt a full-scan tax on every query.
  * Untranslatable filters are simply not pushed (Spark re-applies
  * every filter above the scan regardless — pruning here is an
  * optimization, never a correctness gate). */
object MoRScan {
  import org.apache.spark.sql.{Column, functions => F}
  import org.apache.spark.sql.sources

  private def toColumn(f: sources.Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(F.col(a) === F.lit(v))
    case sources.EqualNullSafe(a, v) => Some(F.col(a) <=> F.lit(v))
    case sources.GreaterThan(a, v) => Some(F.col(a) > F.lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(F.col(a) >= F.lit(v))
    case sources.LessThan(a, v) => Some(F.col(a) < F.lit(v))
    case sources.LessThanOrEqual(a, v) => Some(F.col(a) <= F.lit(v))
    case sources.In(a, vs) => Some(F.col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(F.col(a).isNull)
    case sources.IsNotNull(a) => Some(F.col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(F.col(a).startsWith(v))
    case sources.And(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case sources.Or(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case sources.Not(c) => toColumn(c).map(!_)
    case _ => None
  }

  def prunedRdd(df: DataFrame, requiredColumns: Array[String],
      filters: Array[sources.Filter]): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
    val filtered = filters.flatMap(toColumn).foldLeft(df)(_.filter(_))
    val pruned =
      if (requiredColumns.isEmpty)
        // COUNT(*)-style scans need a row per input row, no columns
        filtered.select()
      else filtered.select(requiredColumns.toIndexedSeq.map(F.col): _*)
    pruned.rdd
  }
}

/** ParquetFileFormat whose write half refuses — the backstop for raw
  * file writes into a log-committed table (see file header). */
final class LogCommitOnlyParquetFormat(formatName: String)
    extends org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat {
  // zero-arg constructor for any reflective instantiation path
  def this() = this("log-committed")
  override def prepareWrite(
      sparkSession: org.apache.spark.sql.SparkSession,
      job: org.apache.hadoop.mapreduce.Job,
      options: Map[String, String],
      dataSchema: StructType): org.apache.spark.sql.execution.datasources.OutputWriterFactory =
    throw new UnsupportedOperationException(
      s"$formatName: INSERT with a static PARTITION clause would write files the " +
        s"transaction log never records — use plain INSERT INTO (log-protocol append) " +
        s"or df.write.format(\"$formatName\") instead")
}

/** The Delta interop batch relation: reads through the pruning
  * FileIndex, inserts through [[graft.interop.DeltaLake.write]]. */
final class GraftDeltaRelation(
    spark: ClassicSession,
    val tablePath: String,
    index: VersionedFileIndex,
    partitionSchemaV: StructType,
    dataSchemaV: StructType,
    partCols: Seq[String])
  extends org.apache.spark.sql.execution.datasources.HadoopFsRelation(
    location = index,
    partitionSchema = partitionSchemaV,
    dataSchema = dataSchemaV,
    bucketSpec = None,
    fileFormat = new LogCommitOnlyParquetFormat("delta"),
    options = Map("path" -> tablePath))(spark)
  with org.apache.spark.sql.sources.InsertableRelation {

  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    graft.interop.DeltaLake.write(data, tablePath,
      partitionBy = if (overwrite) partCols else Nil,
      mode = if (overwrite) SaveMode.Overwrite else SaveMode.Append)
    (): Unit
  }
}

/** The Iceberg interop batch relation: same contract as the Delta one. */
final class GraftIcebergRelation(
    spark: ClassicSession,
    val tablePath: String,
    index: org.apache.spark.sql.execution.datasources.FileIndex,
    partitionSchemaV: StructType,
    dataSchemaV: StructType,
    partCols: Seq[String])
  extends org.apache.spark.sql.execution.datasources.HadoopFsRelation(
    location = index,
    partitionSchema = partitionSchemaV,
    dataSchema = dataSchemaV,
    bucketSpec = None,
    fileFormat = new LogCommitOnlyParquetFormat("iceberg"),
    options = Map("path" -> tablePath))(spark)
  with org.apache.spark.sql.sources.InsertableRelation {

  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    graft.interop.Iceberg.write(data, tablePath,
      partitionBy = if (overwrite) partCols else Nil,
      mode = if (overwrite) SaveMode.Overwrite else SaveMode.Append)
    (): Unit
  }
}

/** Fallback Iceberg batch relation for snapshots carrying POSITION
  * DELETE debt: a [[MoRScan]] pruned-filtered scan over
  * [[graft.interop.Iceberg.read]], which applies the delete files as a
  * broadcast row-index filter. SQL stays fully functional between a
  * merge-on-read DELETE and the next rewrite, and (r14) pushed
  * partition/stats filters prune files in the INNER FileIndex with
  * column pruning on top. Still insertable: an append lands a new
  * snapshot whose files no outstanding delete names. */
final class GraftIcebergMoRRelation(
    outer: org.apache.spark.sql.SQLContext,
    val tablePath: String,
    snapshotId: Option[Long])
  extends org.apache.spark.sql.sources.BaseRelation
  with org.apache.spark.sql.sources.TableScan
  with org.apache.spark.sql.sources.PrunedFilteredScan
  with org.apache.spark.sql.sources.InsertableRelation {

  override def buildScan(requiredColumns: Array[String],
      filters: Array[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
    MoRScan.prunedRdd(
      graft.interop.Iceberg.read(outer.sparkSession, tablePath, snapshotId),
      requiredColumns, filters)

  // every filter re-applies above the scan — pushing is pruning only
  override def unhandledFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = filters

  override def sqlContext: org.apache.spark.sql.SQLContext = outer
  // the metadata schema VERBATIM (nullability included): a catalog
  // table stores the clean relation's schema at CREATE, and a later
  // fallback resolution must report the same one or FindDataSourceTable
  // refuses the "mismatched user-specified schema". Metadata-only —
  // constructing the fallback relation must not force the eager
  // manifest walk the lazy MoR planner exists to avoid.
  override val schema: StructType = graft.interop.Iceberg.tableSchema(tablePath)

  override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
    graft.interop.Iceberg.read(outer.sparkSession, tablePath, snapshotId).rdd

  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    graft.interop.Iceberg.write(data, tablePath,
      mode = if (overwrite) SaveMode.Overwrite else SaveMode.Append)
    (): Unit
  }
}

/** Fallback Delta batch relation for snapshots the raw scan cannot
  * serve directly — COLUMN-MAPPED (`name` mode) tables (physical-name
  * scans renamed to the logical schema) and DELETION-VECTOR debt (the
  * broadcast row-index filter): a `TableScan` over
  * [[graft.interop.DeltaLake.read]]. SQL users see only logical
  * names. */
final class GraftDeltaMappedRelation(
    outer: org.apache.spark.sql.SQLContext,
    val tablePath: String,
    versionAsOf: Option[Long])
  extends org.apache.spark.sql.sources.BaseRelation
  with org.apache.spark.sql.sources.TableScan
  with org.apache.spark.sql.sources.PrunedFilteredScan
  with org.apache.spark.sql.sources.InsertableRelation {

  override def buildScan(requiredColumns: Array[String],
      filters: Array[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
    MoRScan.prunedRdd(
      graft.interop.DeltaLake.read(outer.sparkSession, tablePath, versionAsOf),
      requiredColumns, filters)

  override def unhandledFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = filters

  override def sqlContext: org.apache.spark.sql.SQLContext = outer
  // log schema VERBATIM — same catalog-consistency contract as the
  // Iceberg fallback above
  override val schema: StructType =
    graft.interop.DeltaLake.snapshot(outer.sparkSession, tablePath, versionAsOf).schema

  override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
    graft.interop.DeltaLake.read(outer.sparkSession, tablePath, versionAsOf).rdd

  // INSERT INTO stays available while deletion-vector debt is
  // outstanding (an append's new files are never named by old
  // vectors); DeltaLake.write itself refuses mapped tables loudly
  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    graft.interop.DeltaLake.write(data, tablePath,
      mode = if (overwrite) SaveMode.Overwrite else SaveMode.Append)
    (): Unit
  }
}
