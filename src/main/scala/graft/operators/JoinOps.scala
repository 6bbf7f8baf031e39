package graft.operators

import graft.core._
import graft.core.Casts._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Join battery — SURVEY.md §2.3 rows J1–J8.
  *
  * Scale posture: dimension tables (region/nation/customer/supplier/part)
  * are broadcast — at 100 TB the fact table never shuffles for a dim join.
  * Fact↔fact joins (orders↔lineitem) shuffle on the join key, which is the
  * partitioning a warehouse would bucket on; AQE handles skew at runtime.
  */
object JoinOps extends QueryModule {

  /** J1: inner equi-join fact↔dim, aggregated by dim attribute. */
  val j1Inner = QueryDef(
    "j1_inner_join",
    (s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), unscale(sum(cents("o_totalprice")), 2).as("sum_total"))
        .orderBy("c_mktsegment"),
    Some("""
      SELECT c_mktsegment,
        count(*) AS n_orders,
        sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment
    """.stripMargin.trim),
  )

  /** J2: broadcast hash join of the fact table against a small dim —
    * `broadcast()` pins the strategy so the 100 TB side streams. */
  val j2Broadcast = QueryDef(
    "j2_broadcast_join",
    (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        // 25 constant brand groups = near-global: the product sum widens
        // its accumulator to DECIMAL(38,0) per the Casts.cents bound
        .agg(
          unscale(sum((cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).cast(DecimalType(38, 0))), 4).as("revenue"),
          count(lit(1)).as("n_items"),
        )
        .orderBy("p_brand"),
    Some("""
      SELECT p_brand,
        sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue,
        count(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
      ORDER BY p_brand
    """.stripMargin.trim),
  )

  /** J3: left outer join — customers with zero orders kept (count=0). */
  val j3LeftOuter = QueryDef(
    "j3_left_outer_join",
    (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          unscale(sum(coalesce(cents("o_totalprice"), lit(0L))), 2).as("sum_total"),
        )
        .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey, c_name,
        count(o_orderkey) AS n_orders,
        sum(coalesce(CAST(round(o_totalprice * 100) AS BIGINT), 0)) / 100.0 AS sum_total
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name
      ORDER BY c_custkey
    """.stripMargin.trim),
  )

  /** J3c: right outer join — the mirror of j3_left_outer written from the
    * orders side, so the preserved (right) side is the one Spark plans as
    * the build side of the outer hash join. Suppliers with no lineitems
    * survive with n_items=0. */
  val j3RightOuter = QueryDef(
    "j3_right_outer_join",
    (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"), "right")
        .groupBy("s_suppkey", "s_name")
        .agg(
          count(col("l_orderkey")).as("n_items"),
          unscale(sum(coalesce(cents("l_extendedprice"), lit(0L))), 2).as("sum_price"),
        )
        .orderBy("s_suppkey"),
    Some("""
      SELECT s_suppkey, s_name,
        count(l_orderkey) AS n_items,
        sum(coalesce(CAST(round(l_extendedprice * 100) AS BIGINT), 0)) / 100.0 AS sum_price
      FROM lineitem RIGHT JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_suppkey, s_name
      ORDER BY s_suppkey
    """.stripMargin.trim),
  )

  /** J3b: full outer join of two aggregated sides — nations that have
    * customers, suppliers, or both. */
  val j3FullOuter = QueryDef(
    "j3_full_outer_join",
    (s, d) => {
      val custs = Tables.customer(s, d).groupBy("c_nationkey").agg(count(lit(1)).as("n_cust"))
      val supps = Tables.supplier(s, d).groupBy("s_nationkey").agg(count(lit(1)).as("n_supp"))
      custs
        .join(supps, col("c_nationkey") === col("s_nationkey"), "full")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        )
        .orderBy("nationkey")
    },
    Some("""
      SELECT coalesce(c.k, s.k) AS nationkey,
        coalesce(c.n_cust, 0) AS n_cust,
        coalesce(s.n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
      FULL JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
        ON c.k = s.k
      ORDER BY nationkey
    """.stripMargin.trim),
  )

  /** J4a: left semi join (EXISTS) — customers having a recent order. */
  val j4Semi = QueryDef(
    "j4_semi_join",
    (s, d) => {
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast(TimestampNTZType))
      Tables.customer(s, d)
        .join(recent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
      ORDER BY c_custkey
    """.stripMargin.trim),
  )

  /** J4b: left anti join (NOT EXISTS) — parts never shipped in bulk
    * (no lineitem with quantity > 40). */
  val j4Anti = QueryDef(
    "j4_anti_join",
    (s, d) => {
      val bulk = Tables.lineitem(s, d).filter(col("l_quantity") > 40)
      Tables.part(s, d)
        .join(bulk, col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    },
    Some("""
      SELECT p_partkey, p_name, p_brand
      FROM part
      WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 40)
      ORDER BY p_partkey
    """.stripMargin.trim),
  )

  /** J5: theta/range join against a tiny literal band table — planned as a
    * BroadcastNestedLoopJoin with the bands side broadcast, so the big side
    * streams once regardless of scale. */
  val j5RangeJoin = QueryDef(
    "j5_range_join",
    (s, d) => {
      import s.implicits._
      val bands = Seq(
        ("small", 0L, 100000L),
        ("medium", 100000L, 200000L),
        ("large", 200000L, 10000000L),
      ).toDF("band", "lo", "hi")
      Tables.orders(s, d)
        .join(broadcast(bands), dec2("o_totalprice") >= col("lo") && dec2("o_totalprice") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_orders"), unscale(sum(cents("o_totalprice")), 2).as("sum_total"))
        .orderBy("band")
    },
    Some("""
      SELECT band,
        count(*) AS n_orders,
        sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_total
      FROM orders
      JOIN (VALUES ('small', 0, 100000), ('medium', 100000, 200000), ('large', 200000, 10000000)) b(band, lo, hi)
        ON CAST(o_totalprice AS DECIMAL(12,2)) >= lo AND CAST(o_totalprice AS DECIMAL(12,2)) < hi
      GROUP BY band
      ORDER BY band
    """.stripMargin.trim),
  )

  /** J6: as-of join — for every purchase event, the latest click of the
    * same user at-or-before it. Spark has no ASOF operator; the scalable
    * formulation unions both streams, sorts within user, and carries the
    * last click timestamp forward with a window — one shuffle on user_id,
    * no self-join blowup. Comparisons at microsecond precision (G2: DuckDB
    * reads the nanos column truncated to micros).
    */
  val j6AsOf = QueryDef(
    "j6_asof_join",
    (s, d) => {
      val ev = Tables.events(s, d).withColumn("us", expr("ts div 1000"))
      val tagged = ev
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_id"), col("user_id"), col("us"), col("event_type"))
      // Order clicks before purchases at identical micros so "at-or-before"
      // includes same-instant clicks (matches the oracle's <=).
      val w = Window
        .partitionBy("user_id")
        .orderBy(col("us").asc, when(col("event_type") === "click", 0).otherwise(1).asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      tagged
        .withColumn("last_click_us", max(when(col("event_type") === "click", col("us"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us").as("purchase_us"), col("last_click_us"))
        .orderBy("event_id")
    },
    Some("""
      SELECT p.event_id, p.user_id,
        epoch_us(p.ts) AS purchase_us,
        (SELECT max(epoch_us(c.ts)) FROM events c
          WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts) AS last_click_us
      FROM events p
      WHERE p.event_type = 'purchase'
      ORDER BY p.event_id
    """.stripMargin.trim),
  )

  /** J7: multi-way join chain (TPC-H Q5 analog): region→nation→customer→
    * orders→lineitem→supplier with the local-supplier condition. Dims
    * broadcast; the single fact-fact shuffle is on orderkey. */
  val j7Multiway = QueryDef(
    "j7_multiway_join",
    (s, d) => {
      val region = broadcast(Tables.region(s, d))
      val nation = broadcast(Tables.nation(s, d))
      val customer = broadcast(Tables.customer(s, d))
      val supplier = broadcast(Tables.supplier(s, d))
      Tables.orders(s, d)
        .filter(
          col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampNTZType) &&
            col("o_orderdate") < lit("1998-01-01 00:00:00").cast(TimestampNTZType))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer, col("c_custkey") === col("o_custkey"))
        .join(supplier, col("l_suppkey") === col("s_suppkey"))
        .join(nation, col("s_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        // 25 constant nation groups = near-global: widened accumulator
        // per the Casts.cents bound
        .agg(unscale(sum((cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).cast(DecimalType(38, 0))), 4).as("revenue"))
        .orderBy(col("r_name").asc, col("revenue").desc, col("n_name").asc)
    },
    Some("""
      SELECT r_name, n_name,
        sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
      FROM orders
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY r_name, n_name
      ORDER BY r_name ASC, revenue DESC, n_name ASC
    """.stripMargin.trim),
  )

  /** J7b: TPC-H Q3 analog — 3-way join, grouped top-k by revenue. */
  val j7ShippingPriority = QueryDef(
    "j7_shipping_priority",
    (s, d) =>
      Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast(TimestampNTZType))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > lit("1998-01-01 00:00:00").cast(TimestampNTZType))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(unscale(sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount"))), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10),
    Some("""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
        sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey ASC
      LIMIT 10
    """.stripMargin.trim),
  )

  /** J7c: TPC-H Q10 analog — returned-item report: customers ranked by
    * revenue lost to returns in a window, with nation context. */
  val j7ReturnedItems = QueryDef(
    "j7_returned_items",
    (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(
          col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampNTZType) &&
            col("o_orderdate") < lit("1997-01-01 00:00:00").cast(TimestampNTZType))
        .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(unscale(sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount"))), 4).as("lost_revenue"))
        .orderBy(col("lost_revenue").desc, col("c_custkey").asc)
        .limit(20),
    Some("""
      SELECT c_custkey, c_name, n_name,
        sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS lost_revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY lost_revenue DESC, c_custkey ASC
      LIMIT 20
    """.stripMargin.trim),
  )

  /** J2b: TPC-H Q14 analog — promo revenue share: conditional aggregation
    * over a broadcast join, ratio as one IEEE division of exact
    * integer-scaled sums (Casts.cents). These sums are UNGROUPED — the
    * weakest overflow bound in the battery — so their accumulators widen
    * to DECIMAL(38,0) per the Casts.cents bound (multiply chain stays
    * primitive; DuckDB's side is HUGEINT automatically). */
  val j2PromoShare = QueryDef(
    "j2_promo_share",
    (s, d) => {
      val revCents = (cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).cast(DecimalType(38, 0))
      val promoCents = sum(when(col("p_type") === "PROMO", revCents).otherwise(lit(0L).cast(DecimalType(38, 0))))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .agg(
          unscale(promoCents, 4).as("promo_revenue"),
          unscale(sum(revCents), 4).as("total_revenue"),
          (promoCents.cast("double") * 100.0 / sum(revCents).cast("double")).as("promo_pct"),
        )
    },
    Some("""
      SELECT
        sum(CASE WHEN p_type = 'PROMO' THEN CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) ELSE 0 END) / 10000.0 AS promo_revenue,
        sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS total_revenue,
        CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) ELSE 0 END) AS DOUBLE) * 100.0
          / CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) AS promo_pct
      FROM lineitem JOIN part ON l_partkey = p_partkey
    """.stripMargin.trim),
  )

  /** J8: cross join — bounded grid (5 regions × 3 return flags). Only ever
    * sane when one side is O(1); anything larger goes through L2/L3's
    * LSH-bucketed paths instead. */
  val j8Cross = QueryDef(
    "j8_cross_join",
    (s, d) => {
      val flags = Tables.lineitem(s, d).select("l_returnflag").distinct()
      Tables.region(s, d)
        .crossJoin(broadcast(flags))
        .select("r_name", "l_returnflag")
        .orderBy("r_name", "l_returnflag")
    },
    Some("""
      SELECT r_name, l_returnflag
      FROM region CROSS JOIN (SELECT DISTINCT l_returnflag FROM lineitem) f
      ORDER BY r_name, l_returnflag
    """.stripMargin.trim),
  )

  /** J9: skew-salted shuffle join — the "megacustomer" mitigation
    * ([[graft.core.Skew.saltedJoin]]): the fact side spreads each key
    * over 8 deterministic sub-keys, the dim side replicates 8×, the SMJ
    * runs on (key, salt) so no single task ever owns a whole hot key.
    * Result is bit-equal to the plain join — which is exactly what the
    * oracle proves. At test scale the keys aren't skewed; the entry
    * locks mechanism correctness (and PlanAuditSpec locks the salted
    * shuffle shape) so the helper is safe to reach for when a real hot
    * key appears. */
  val j9SkewSalted = QueryDef(
    "j9_skew_salted",
    (s, d) => {
      val big = Tables.lineitem(s, d)
        .select(col("l_suppkey").as("suppkey"), cents("l_extendedprice").as("price_c"))
      val small = Tables.supplier(s, d)
        .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
      graft.core.Skew.saltedJoin(big, small, "suppkey", saltFactor = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"), unscale(sum(col("price_c")), 2).as("sum_price"))
        .orderBy("s_nationkey")
    },
    Some("""
      SELECT s_nationkey,
        count(*) AS n_items,
        sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_price
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_nationkey
      ORDER BY s_nationkey
    """.stripMargin.trim),
  )

  /** J10: bucketed co-located fact↔fact join — the storage-level answer to
    * "this join shuffles 100 TB every night". Both sides are written as
    * bucketed tables on the join key with the same bucket count
    * ([[graft.ingest.Writers.bucketed]]); matching hash-partitioned
    * layouts mean the SortMergeJoin reads bucket i against bucket i with
    * ZERO Exchange on the join keys (PlanAuditSpec locks that shape with
    * broadcast disabled). The write cost is paid once; every subsequent
    * join of the pair is shuffle-free — at 100 TB that converts the
    * dominant recurring shuffle into a one-time layout decision, exactly
    * what warehouse bucketing exists for. The oracle replays the same
    * join from the raw parquet: bucketing must change the plan, never
    * the answer. */
  val j10Bucketed = QueryDef(
    "j10_bucketed_join",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), cents("l_extendedprice").as("price_c"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"))
      graft.ingest.Writers.bucketed(li, "graft_j10_lineitem", "l_orderkey", 8)
      graft.ingest.Writers.bucketed(ord, "graft_j10_orders", "o_orderkey", 8)
      s.table("graft_j10_lineitem")
        .join(s.table("graft_j10_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"), unscale(sum(col("price_c")), 2).as("sum_price"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority,
        count(*) AS n_items,
        sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_price
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """.stripMargin.trim),
  )

  /** J11: SCD2 POINT-IN-TIME LOOKUP — the slowly-changing-dimension
    * join every warehouse fact pipeline runs: each order resolves the
    * customer attribute AS OF its order date against a two-era
    * validity-interval dimension (era split per customer,
    * deterministic). The scale-critical property: this is an
    * EQUI-join on the customer key with the validity window as a
    * post-join predicate — never a range-only join — so it
    * shuffles/broadcasts exactly like J1 regardless of how many eras
    * the dimension accretes. The dimension is derived in-query (no
    * table write prices the entry); S10 grades the SCD2 WRITE side. */
  val j11Scd2Lookup = QueryDef(
    "j11_scd2_pointlookup",
    (s, d) => {
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"),
          expr("date_add(DATE'1996-01-01', CAST(c_custkey % 730 AS INT))").as("split_d"))
      val dim = cust.select(col("c_custkey"), lit("v1").as("era"),
          lit(java.sql.Date.valueOf("1990-01-01")).as("valid_from"),
          col("split_d").as("valid_to"), col("c_mktsegment").as("segment"))
        .unionAll(cust.select(col("c_custkey"), lit("v2").as("era"),
          col("split_d").as("valid_from"),
          lit(java.sql.Date.valueOf("9999-12-31")).as("valid_to"),
          concat(col("c_mktsegment"), lit("_R")).as("segment")))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderdate").cast("date").as("o_date"),
          col("o_totalprice"))
        .join(dim, col("o_custkey") === dim("c_custkey") &&
          col("o_date") >= dim("valid_from") && col("o_date") < dim("valid_to"))
        .groupBy("era", "segment")
        .agg(count(lit(1)).as("n_orders"),
          unscale(sum(cents("o_totalprice")), 2).as("sum_total"))
        .orderBy("era", "segment")
    },
    Some("""
      WITH cust AS (
        SELECT c_custkey, c_mktsegment,
          DATE '1996-01-01' + CAST(c_custkey % 730 AS INT) AS split_d
        FROM customer
      ), dim AS (
        SELECT c_custkey, 'v1' AS era, DATE '1990-01-01' AS valid_from,
          split_d AS valid_to, c_mktsegment AS segment FROM cust
        UNION ALL
        SELECT c_custkey, 'v2', split_d, DATE '9999-12-31',
          c_mktsegment || '_R' FROM cust
      )
      SELECT era, segment, count(*) AS n_orders,
        sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_total
      FROM orders o JOIN dim
        ON o.o_custkey = dim.c_custkey
        AND CAST(o.o_orderdate AS DATE) >= dim.valid_from
        AND CAST(o.o_orderdate AS DATE) < dim.valid_to
      GROUP BY era, segment
      ORDER BY era, segment
    """.stripMargin.trim),
  )

  def defs: Seq[QueryDef] = Seq(
    j1Inner, j2Broadcast, j2PromoShare, j3LeftOuter, j3RightOuter, j3FullOuter, j4Semi, j4Anti,
    j5RangeJoin, j6AsOf, j7Multiway, j7ShippingPriority, j7ReturnedItems, j8Cross, j9SkewSalted,
    j10Bucketed, j11Scd2Lookup,
  )
}
