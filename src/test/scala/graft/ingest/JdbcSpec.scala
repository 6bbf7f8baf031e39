package graft.ingest

import graft.SparkFixture
import java.nio.file.Paths
import org.scalatest.funsuite.AnyFunSuite

/** S4 live: embedded-Derby round-trip through the partitioned JDBC
  * reader — the execution coverage VERDICT r2 flagged as missing. */
class JdbcSpec extends AnyFunSuite with SparkFixture {

  private def scratch(name: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft_test", name).toString

  test("s4: Derby round-trip preserves rows and runs as numPartitions range scans") {
    val dir = scratch(s"jdbc_rt_p${ProcessHandle.current().pid()}")
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
    val dir = scratch(s"jdbc_rt_p${ProcessHandle.current().pid()}") // reuse the DB from the round-trip test
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
    val dir = scratch(s"jdbc_rt_p${ProcessHandle.current().pid()}")
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
}
