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

  /** `events.ts` is parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) →
    * Spark `TimestampNTZType` (corpus regenerated 2026-08-13; earlier
    * corpora wrote INT64 TIMESTAMP(NANOS), which Spark surfaced as a
    * nanoseconds long under `nanosAsLong`). Every downstream operator and
    * oracle was built on the nanos-long contract — Spark `ts div 1000` ==
    * DuckDB `epoch_us(ts)` — so the loader re-surfaces `ts` as LongType
    * epoch NANOSECONDS: the NTZ wall-clock is anchored at UTC (session
    * zone pinned here, making the NTZ→TZ cast deterministic in any
    * harness session) and scaled ×1000. DuckDB reads the same column as a
    * naive microsecond TIMESTAMP, so the micros-precision compare is
    * bit-identical to the old corpus (whose sub-micro digits DuckDB
    * truncated anyway).
    *
    * The UTC anchor is SCOPED, not a session-wide pin (r7 ADVICE): the
    * NTZ→TZ cast binds the session zone at ANALYSIS time
    * (ResolveTimeZone stamps the Cast when `withColumn` analyzes the
    * plan), so pinning UTC only around the eager analysis and restoring
    * the caller's zone leaves every other timestamp expression in the
    * session untouched while this frame's cast stays deterministic. */
  def events(s: SparkSession, d: String): DataFrame = {
    val prior = s.conf.getOption("spark.sql.session.timeZone")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    try
      table(s, d, "events").withColumn(
        "ts",
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType)) * 1000L)
    finally prior match {
      case Some(z) => s.conf.set("spark.sql.session.timeZone", z)
      case None    => s.conf.unset("spark.sql.session.timeZone")
    }
  }
}
