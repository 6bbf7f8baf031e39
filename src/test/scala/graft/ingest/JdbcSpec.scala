package graft.ingest

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** S4 live: embedded-Derby round-trip through the partitioned JDBC
  * reader — the execution coverage VERDICT r2 flagged as missing. */
class JdbcSpec extends AnyFunSuite with SparkFixture {

  /** Derby DBs land in the per-process Scratch tree (pid-keyed, removed
    * by its shutdown hook) — test JVMs must not accumulate DB dirs. */
  private def scratch(name: String): String =
    Scratch.dir("test", name, sf()).toString

  test("s4: Derby round-trip preserves rows and runs as numPartitions range scans") {
    val dir = scratch("jdbc_rt")
    val url = Jdbc.derbyUrl(dir)
    val nation = spark.read.parquet(s"${sf()}/nation.parquet")
    Jdbc.load(nation, url, "NATION")

    val pulled = Readers.jdbcPartitioned(
      spark, url, "NATION", "n_nationkey", 0L, 25L, numPartitions = 4,
      props = Map("driver" -> Jdbc.DerbyEmbeddedDriver))

    // the partitioned scan must actually fan out into 4 range queries
    assert(pulled.rdd.getNumPartitions == 4,
      s"expected 4 JDBC partitions, got ${pulled.rdd.getNumPartitions}")

    val got = pulled.select("n_nationkey", "n_name", "n_regionkey")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    val want = nation.select("n_nationkey", "n_name", "n_regionkey")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("s4: partition options land in the relation (bounds + count wired through)") {
    val dir = scratch("jdbc_rt") // reuse the DB from the round-trip test
    val url = Jdbc.derbyUrl(dir)
    val nation = spark.read.parquet(s"${sf()}/nation.parquet")
    Jdbc.load(nation, url, "NATION")
    val pulled = Readers.jdbcPartitioned(
      spark, url, "NATION", "n_nationkey", 0L, 25L, numPartitions = 4,
      props = Map("driver" -> Jdbc.DerbyEmbeddedDriver))
    val rel = pulled.queryExecution.analyzed.toString
    assert(rel.contains("JDBCRelation(NATION)") && rel.contains("numPartitions=4"),
      s"JDBC partition options not visible in relation:\n$rel")
  }

  test("s4: a filter on the pulled frame pushes down into the JDBC scan") {
    val dir = scratch("jdbc_rt")
    val url = Jdbc.derbyUrl(dir)
    val nation = spark.read.parquet(s"${sf()}/nation.parquet")
    Jdbc.load(nation, url, "NATION")
    import org.apache.spark.sql.functions.col
    val pulled = Readers.jdbcPartitioned(
      spark, url, "NATION", "n_nationkey", 0L, 25L, numPartitions = 4,
      props = Map("driver" -> Jdbc.DerbyEmbeddedDriver))
      .filter(col("n_regionkey") === 2)
    val plan = pulled.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"),
      s"region filter not pushed to the database:\n$plan")
    assert(pulled.count() == nation.filter(col("n_regionkey") === 2).count())
  }

  test("s4b: the incremental watermark predicate is pushed into the DB-side query") {
    // the exact composition s4b_jdbc_incremental runs: incrementalAppend's
    // `watermark > last` filter applied to the RAW partitioned JDBC frame
    // must reach the database as a WHERE clause, so the daily pull
    // extracts only new rows instead of re-reading the table
    import org.apache.spark.sql.functions.{col, lit}
    val dir = scratch("jdbc_incr")
    val url = Jdbc.derbyUrl(dir)
    val nation = spark.read.parquet(s"${sf()}/nation.parquet")
    Jdbc.load(nation, url, "NATION")
    val pull = Readers.jdbcPartitioned(
      spark, url, "NATION", "n_nationkey", 0L, 25L, numPartitions = 4,
      props = Map("driver" -> Jdbc.DerbyEmbeddedDriver))
    val wm = 16L
    val fresh = pull.filter(col("n_nationkey") > lit(wm)) // incrementalAppend's filter shape
    val plan = fresh.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(n_nationkey"),
      s"watermark predicate not pushed into the JDBC scan:\n$plan")
    assert(fresh.count() == nation.filter(col("n_nationkey") > wm).count())

    // end-to-end: seed + incrementalAppend over the JDBC frame rebuilds the dim
    val wh = Scratch.dir("test", "jdbc_incr_wh", sf()).toString
    pull.filter(col("n_nationkey") <= wm)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(wh)
    val next = Writers.incrementalAppend(pull, "n_nationkey", Some(wm), wh)
    assert(next.contains(24), s"watermark must advance to the max pulled key, got $next")
    assert(spark.read.parquet(wh).count() == nation.count())
  }
}
