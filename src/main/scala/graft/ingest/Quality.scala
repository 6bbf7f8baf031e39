package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality reporting — the validation step an ingest utility runs
  * before promoting a load. All rules evaluate in ONE aggregate pass
  * over one scan (a per-rule pass would scan the 100 TB fact once per
  * rule); the output is a long-format report (rule, n_rows, n_violations,
  * violation_rate) ready to gate a pipeline or land next to the table.
  *
  * Rules are (name, predicate-that-good-rows-satisfy). Cross-table rules
  * (referential integrity) are expressed by precomputing a flag column
  * on `df` first — e.g. a left-anti-join marker — so the report itself
  * stays single-pass.
  */
object Quality {

  def report(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val counters = rules.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"__viol_$name")
    } :+ count(lit(1)).as("__n")
    val row = df.agg(counters.head, counters.tail: _*)
    // one aggregated row → long format via stack (no second scan)
    val stackArgs = rules
      .map { case (name, _) => s"'$name', __viol_$name" }
      .mkString(", ")
    row.selectExpr(s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)", "__n AS n_rows")
      .select(
        col("rule"),
        col("n_rows"),
        col("n_violations"),
        (col("n_violations").cast("double") / col("n_rows")).as("violation_rate"),
      )
  }
}
