package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded query: a Spark DataFrame program plus (optionally) the
  * equivalent ANSI SQL the driver replays in DuckDB over the same parquet
  * tables. Keeping the pair adjacent in one value is what keeps column
  * aliases / ordering / casts in sync between the two sides (the driver's
  * compare is a hash over column-name-sorted values, so any drift fails).
  *
  * `oracle == None` → the driver records a weaker rows-only check (used for
  * approx/hash-seeded/streaming operators whose output is not
  * SQL-reproducible in DuckDB).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

trait QueryModule {
  def defs: Seq[QueryDef]
}
