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
}
