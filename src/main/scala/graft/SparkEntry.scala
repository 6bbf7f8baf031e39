package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{QueryDef, QueryModule}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator battery lives in its own [[QueryModule]]; this object is
  * only the aggregation point the driver harness calls into.
  */
object SparkEntry {

  /** Ordered list of all operator batteries. */
  def modules: Seq[QueryModule] = Seq(
    graft.operators.IngestOps,
    graft.operators.ProjectFilterOps,
    graft.operators.JoinOps,
    graft.operators.AggOps,
    graft.operators.WindowOps,
    graft.operators.SetSortOps,
    graft.operators.ReshapeOps,
    graft.operators.FnOps,
    graft.operators.SqlOps,
    graft.operators.EventOps,
    graft.streaming.StreamOps,
    graft.text.TextOps,
    graft.dedup.DedupOps,
    graft.similarity.SimilarityOps,
    graft.multimodal.MultimodalOps,
    graft.graph.GraphOps,
  )

  def allDefs: Seq[QueryDef] = modules.flatMap(_.defs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.AggOps.a1PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
