package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test corpus (see /root/repo/FIXTURES.md).
  *
  * Every query function receives `(spark, sfDir)` and must read only from
  * `$sfDir/<table>.parquet`. At 100 TB these would be partitioned
  * directories / catalog tables; the single-call indirection here means the
  * storage layout can change without touching any operator code.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS), which Spark 4 refuses
    * to read unless `nanosAsLong` is set (runtime-settable; see FIXTURES.md).
    * After the conf the column surfaces as LongType nanoseconds. DuckDB
    * reads the same column as a microsecond TIMESTAMP (nanos truncated), so
    * oracled queries must compare at microsecond precision:
    * Spark `ts div 1000` == DuckDB `epoch_us(ts)`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }
}
