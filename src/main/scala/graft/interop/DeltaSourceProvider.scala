package graft.interop

import org.apache.spark.sql.{DataFrame, SaveMode, SQLContext}
import org.apache.spark.sql.execution.datasources.DataSourceUtils
import org.apache.spark.sql.sources.{
  BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}

/** `spark.read.format("delta")` / `df.write.format("delta")` over
  * [[DeltaLake]] — the familiar surface for users coming FROM Delta,
  * resolvable here because no Delta jar is on the classpath to claim
  * the short name (ServiceLoader registration; if a real Delta build
  * is ever added, remove this registration and keep the library API).
  *
  * Read options: `versionAsOf` (time travel). Write: modes
  * `overwrite`/`append` plus `.partitionBy(...)`, all landing through
  * the atomic log-commit protocol in [[DeltaLake.write]]. */
final class DeltaSourceProvider extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "delta"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase("path") => v }
      .getOrElse(throw new IllegalArgumentException("delta: 'path' is required"))

  override def createRelation(
      sqlContext: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val versionAsOf = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("versionAsOf") => v.toLong
    }
    DeltaLake.relationFor(sqlContext.sparkSession, pathOf(parameters), versionAsOf)
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
    val exists = DeltaLake.isDeltaTable(path)
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalArgumentException(s"delta: $path already exists (mode=errorifexists)")
      case SaveMode.Ignore if exists => ()
      case SaveMode.Append if exists =>
        DeltaLake.write(data, path, partitionBy, SaveMode.Append): Unit
      case _ =>
        DeltaLake.write(data, path, partitionBy, SaveMode.Overwrite): Unit
    }
    createRelation(sqlContext, parameters)
  }
}
