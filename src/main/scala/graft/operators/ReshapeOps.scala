package graft.operators

import graft.core._
import graft.core.Casts._
import org.apache.spark.sql.functions._

/** Reshaping battery — pivot/unpivot/grouping-sets/sampling: the ETL
  * reshape operations between ingestion and analytics.
  *
  * Pivot keys must be enumerable (here: the 3 order statuses) — Spark
  * pivots into columns at plan time, so the key set is bounded by
  * construction; the unbounded analog stays long-format (groupBy). The
  * DuckDB oracles express the pivot as conditional aggregation, which is
  * exactly what Catalyst lowers .pivot() to.
  */
object ReshapeOps extends QueryModule {

  /** Pivot: order counts and totals by priority, statuses as columns. */
  val r1Pivot = QueryDef(
    "r1_pivot",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(
          col("o_orderpriority"),
          col("F").cast("long").as("n_f"),
          col("O").cast("long").as("n_o"),
          col("P").cast("long").as("n_p"),
        )
        .orderBy("o_orderpriority"),
    Some("""
      SELECT o_orderpriority,
        count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """.stripMargin.trim),
  )

  /** Unpivot (melt): per-returnflag aggregate metrics rotated to long
    * (metric, value) rows. */
  val r2Unpivot = QueryDef(
    "r2_unpivot",
    (s, d) => {
      val wide = Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          unscale(sum(cents("l_quantity")), 2).as("total_qty"),
          unscale(sum(cents("l_extendedprice")), 2).as("total_price"),
        )
      wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("total_qty"), col("total_price")),
        "metric", "value")
        .orderBy("l_returnflag", "metric")
    },
    Some("""
      WITH wide AS (
        SELECT l_returnflag,
          sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS total_qty,
          sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS total_price
        FROM lineitem GROUP BY l_returnflag
      )
      SELECT l_returnflag, metric, value FROM (
        SELECT l_returnflag, 'total_qty' AS metric, total_qty AS value FROM wide
        UNION ALL
        SELECT l_returnflag, 'total_price' AS metric, total_price AS value FROM wide
      ) u
      ORDER BY l_returnflag, metric
    """.stripMargin.trim),
  )

  /** GROUPING SETS with grouping-id disambiguation (beyond a5's
    * rollup/cube): two hand-picked sets plus the grand total. */
  val r3GroupingSets = QueryDef(
    "r3_grouping_sets",
    (s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
          count(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
      """)
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority,
        count(*) AS n_orders
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """.stripMargin.trim),
  )

  /** Seeded sampling — deterministic within Spark for a fixed file layout
    * (per-partition RNG), but not reproducible in another engine:
    * *rows-only*. The scalable survey tool: the sample is taken inside
    * the scan, never materializing the population. */
  val r4Sample = QueryDef(
    "r4_sample",
    (s, d) =>
      Tables.lineitem(s, d)
        .sample(withReplacement = false, fraction = 0.1, seed = 42L)
        .agg(
          count(lit(1)).as("n_sampled"),
          unscale(sum(cents("l_extendedprice")), 2).as("sampled_price"),
        ),
    None,
  )

  /** R4b: systematic sampling — every k-th key, deterministic across ANY
    * engine and any partitioning (unlike RNG sampling), so this variant
    * carries a full oracle. The production trade-off: systematic samples
    * are reproducible and cheap (a pushed-down predicate on the key) but
    * biased if the key correlates with the measure; r4's seeded RNG
    * sample is the unbiased one. */
  val r4bSystematic = QueryDef(
    "r4b_systematic_sample",
    (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 10 === 0)
        .agg(
          count(lit(1)).as("n_sampled"),
          unscale(sum(cents("o_totalprice")), 2).as("sampled_total"),
          countDistinct(col("o_custkey")).as("n_cust"),
        ),
    Some("""
      SELECT count(*) AS n_sampled,
        sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS sampled_total,
        count(DISTINCT o_custkey) AS n_cust
      FROM orders
      WHERE o_orderkey % 10 = 0
    """.stripMargin.trim),
  )

  def defs: Seq[QueryDef] = Seq(r1Pivot, r2Unpivot, r3GroupingSets, r4Sample, r4bSystematic)
}
