package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract-level invariants over the whole query registry. */
class RegistrySpec extends AnyFunSuite with SparkFixture {

  test("query names are unique across modules") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size == names.size, s"duplicates: ${names.diff(names.distinct)}")
  }

  test("every oracle belongs to a declared query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("oracle SQL references only bare table names the driver registers") {
    val known = Set("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
    val fromPattern = "(?is)\\bFROM\\s+([a-z_][a-z0-9_]*)\\b".r
    for ((name, sql) <- SparkEntry.oracleSql) {
      for (m <- fromPattern.findAllMatchIn(sql)) {
        val t = m.group(1).toLowerCase
        // CTE names / derived aliases are fine; flag obvious path-like refs
        assert(!t.contains("/") && !t.endsWith(".parquet"), s"$name references a path: $t")
      }
      assert(sql.toUpperCase.contains("ORDER BY") || !sql.toUpperCase.contains("GROUP BY") || name.startsWith("a2"),
        s"$name: oracled aggregate without total ORDER BY")
    }
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("stateful entries (scratch dirs, catalog tables, streams) are idempotent within a session") {
    // these mutate session/filesystem state; running twice must give
    // identical results (the driver's Verify and Bench both invoke them
    // in one long-lived process)
    for (name <- Seq("s2b_ingest_pipeline", "s4_jdbc_pull", "s5_xlsx_ingest", "s7_partitioned_write",
                     "s8_incremental_append", "stream_t1_tumbling", "stream_t5_dedup",
                     "stream_t7_file_sink", "stream_t9_foreach_upsert", "l2f_dedup_clusters",
                     "s21_compacted_history", "s24_file_skipping", "stream_t11_cdf_consumer")) {
      val fn = SparkEntry.queries(name)
      val first = fn(spark, sf()).collect().map(_.toString).sorted.toSeq
      val second = fn(spark, sf()).collect().map(_.toString).sorted.toSeq
      assert(first == second, s"$name drifts on rerun")
      assert(first.nonEmpty, s"$name returned no rows")
    }
  }
}
