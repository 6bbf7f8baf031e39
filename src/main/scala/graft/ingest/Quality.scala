package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality reporting — the validation step an ingest utility runs
  * before promoting a load. All rules evaluate in ONE aggregate pass
  * over one scan (a per-rule pass would scan the 100 TB fact once per
  * rule); the output is a long-format report (rule, n_rows, n_violations,
  * violation_rate) ready to gate a pipeline or land next to the table.
  *
  * Rules are (name, predicate-that-good-rows-satisfy); a NULL predicate
  * counts as a violation. Cross-table rules (referential integrity) are
  * expressed by precomputing a flag column on `df` first — e.g. a
  * left-anti-join marker — so the report itself stays single-pass.
  *
  * Empty input: n_violations is 0 and violation_rate NULL for every rule
  * — an empty load has no defined rate, so a promotion gate must check
  * `n_rows > 0` explicitly rather than inferring health from the rates.
  */
object Quality {

  def report(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      s"rule names must be distinct: ${rules.map(_._1).mkString(", ")}")
    // internal aliases are index-based and the long format is built with
    // the Column API — rule names are DATA (arbitrary strings, quotes and
    // dashes welcome), never spliced into SQL text
    val counters = rules.zipWithIndex.map { case ((_, pred), i) =>
      coalesce(sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)), lit(0L)).as(s"__viol_$i")
    } :+ count(lit(1)).as("__n")
    val entries = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"__viol_$i").as("n_violations"))
    }
    df.agg(counters.head, counters.tail: _*)
      .select(explode(array(entries: _*)).as("r"), col("__n").as("n_rows"))
      .select(
        col("r.rule").as("rule"),
        col("n_rows"),
        col("r.n_violations").as("n_violations"),
        when(col("n_rows") === 0, lit(null).cast("double"))
          .otherwise(col("r.n_violations").cast("double") / col("n_rows"))
          .as("violation_rate"),
      )
  }
}
