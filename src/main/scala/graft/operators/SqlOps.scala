package graft.operators

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-string surface + subquery battery — SURVEY.md §3 (optional SQL-in
  * entry point) and §4 (Catalyst subquery decorrelation).
  *
  * These entries register the corpus as temp views and run `spark.sql`
  * directly — the same text works in both engines, so the oracle IS the
  * query. Catalyst decorrelates the scalar/EXISTS subqueries into
  * aggregate+join plans (visible via graft.Explain); DuckDB does its own
  * decorrelation — both sides stay set-parallel, no per-row re-execution.
  */
object SqlOps extends QueryModule {

  private def withViews(s: SparkSession, d: String)(sql: String): DataFrame = {
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
    s.sql(sql)
  }

  private val sub1Sql = """
      SELECT c_nationkey, c_custkey, c_name
      FROM customer c
      WHERE c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
      ORDER BY c_nationkey, c_custkey
    """.stripMargin.trim

  /** Correlated scalar subquery: richest customer(s) per nation. */
  val sub1Scalar = QueryDef(
    "sub1_scalar_subquery",
    (s, d) => withViews(s, d)(sub1Sql),
    Some(sub1Sql),
  )

  private val sub2Sql = """
      SELECT o_orderkey, o_orderpriority
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 49)
      ORDER BY o_orderkey
    """.stripMargin.trim

  /** IN / NOT IN subqueries (planned as semi/anti joins). */
  val sub2In = QueryDef(
    "sub2_in_subquery",
    (s, d) => withViews(s, d)(sub2Sql),
    Some(sub2Sql),
  )

  private val sub3Sql = """
      SELECT n_name, count(*) AS n_suppliers
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_suppkey = s_suppkey
                      AND l_discount >= 0.09)
      GROUP BY n_name
      ORDER BY n_name
    """.stripMargin.trim

  /** Correlated EXISTS feeding an aggregate. */
  val sub3Exists = QueryDef(
    "sub3_exists_subquery",
    (s, d) => withViews(s, d)(sub3Sql),
    Some(sub3Sql),
  )

  private val sub4Sql = """
      SELECT n_name, t.c_custkey, t.c_acctbal
      FROM nation, LATERAL (
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_custkey ASC
        LIMIT 2
      ) t
      ORDER BY n_name, t.c_acctbal DESC, t.c_custkey
    """.stripMargin.trim

  /** Correlated LATERAL subquery with per-row ORDER BY + LIMIT (top-2
    * customers per nation) — the DecorrelateInnerQuery path, distinct
    * from scalar/IN/EXISTS rewrites. Same text runs in DuckDB. */
  val sub4Lateral = QueryDef(
    "sub4_lateral_join",
    (s, d) => withViews(s, d)(sub4Sql),
    Some(sub4Sql),
  )

  def defs: Seq[QueryDef] = Seq(sub1Scalar, sub2In, sub3Exists, sub4Lateral)
}
