package graft.operators

import graft.core._
import graft.core.Casts._
import org.apache.spark.sql.functions._

/** Projection / filter / sanitize / coercion battery — SURVEY.md §2.2 rows
  * P1–P4. Narrow, shuffle-free plans: projections and filters stay inside
  * the parquet scan via Catalyst pushdown (verified with .explain —
  * PushedFilters + pruned ReadSchema).
  */
object ProjectFilterOps extends QueryModule {

  /** P1: projection, rename, computed columns. */
  val p1Projection = QueryDef(
    "p1_projection",
    (s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey").as("cust_id"),
          upper(col("c_name")).as("name_uc"),
          col("c_mktsegment").as("segment"),
          money2(dec2("c_acctbal") * lit(2)).as("double_bal"),
        )
        .orderBy("cust_id"),
    Some("""
      SELECT c_custkey AS cust_id,
        upper(c_name) AS name_uc,
        c_mktsegment AS segment,
        CAST(round(CAST(c_acctbal AS DECIMAL(12,2)) * 2, 2) AS DOUBLE) AS double_bal
      FROM customer
      ORDER BY cust_id
    """.stripMargin.trim),
  )

  /** P2: filter combos — comparison, BETWEEN, IN, LIKE, IS NOT NULL,
    * AND/OR. All push down to the parquet scan. */
  val p2FilterCombo = QueryDef(
    "p2_filter_combo",
    (s, d) =>
      Tables.orders(s, d)
        .filter(
          (col("o_orderstatus").isin("F", "O")) &&
            dec2("o_totalprice").between(lit(50000), lit(200000)) &&
            (col("o_orderpriority").like("1-%") || col("o_orderpriority").like("2-%")) &&
            col("o_orderdate").isNotNull)
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey, o_orderstatus, o_orderpriority
      FROM orders
      WHERE o_orderstatus IN ('F','O')
        AND CAST(o_totalprice AS DECIMAL(12,2)) BETWEEN 50000 AND 200000
        AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
        AND o_orderdate IS NOT NULL
      ORDER BY o_orderkey
    """.stripMargin.trim),
  )

  /** P3: column-name sanitization — a deliberately messy header set is
    * renamed through graft.ingest.Sanitize; the oracle simply selects the
    * expected clean names, proving the mapping. Rename is plan-metadata
    * only: zero cost at any scale. */
  val p3Sanitize = QueryDef(
    "p3_sanitize",
    (s, d) => {
      val messy = Tables.customer(s, d)
        .select(
          col("c_custkey").as("  Cust Key!! "),
          col("c_name").as("Cust-Name"),
          col("c_acctbal").as("acct bal ($)"),
          col("c_mktsegment").as("2024 segment"),
        )
      graft.ingest.Sanitize(messy)
        .select(col("cust_key"), col("cust_name"), col("acct_bal"), col("c_2024_segment"))
        .orderBy("cust_key")
    },
    Some("""
      SELECT c_custkey AS cust_key,
        c_name AS cust_name,
        c_acctbal AS acct_bal,
        c_mktsegment AS c_2024_segment
      FROM customer
      ORDER BY cust_key
    """.stripMargin.trim),
  )

  /** P4: type coercion with bad-row handling — try_cast returns NULL for
    * corrupted values instead of failing the job (the only sane contract
    * when 100 TB of raw text contains garbage). The corrupt marker is
    * injected deterministically so both engines see identical input. */
  val p4Coercion = QueryDef(
    "p4_coercion",
    (s, d) =>
      Tables.part(s, d)
        .withColumn(
          "size_str",
          when(col("p_partkey") % 7 === 0, concat(lit("x"), col("p_size").cast("string")))
            .otherwise(col("p_size").cast("string")))
        .select(
          col("p_partkey"),
          col("size_str"),
          expr("try_cast(size_str AS INT)").as("size_parsed"),
          expr("try_cast(size_str AS INT)").isNull.as("is_corrupt"),
        )
        .orderBy("p_partkey"),
    Some("""
      WITH raw AS (
        SELECT p_partkey,
          CASE WHEN p_partkey % 7 = 0 THEN 'x' || CAST(p_size AS VARCHAR)
               ELSE CAST(p_size AS VARCHAR) END AS size_str
        FROM part
      )
      SELECT p_partkey, size_str,
        try_cast(size_str AS INTEGER) AS size_parsed,
        try_cast(size_str AS INTEGER) IS NULL AS is_corrupt
      FROM raw
      ORDER BY p_partkey
    """.stripMargin.trim),
  )

  def defs: Seq[QueryDef] = Seq(p1Projection, p2FilterCombo, p3Sanitize, p4Coercion)
}
