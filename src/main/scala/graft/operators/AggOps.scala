package graft.operators

import graft.core._
import graft.core.Casts._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation battery — SURVEY.md §2.4 rows A1–A8.
  *
  * Oracle-parity rules applied throughout (SURVEY §5.3 R1–R4):
  *  - money doubles are scaled to EXACT integral cents *before*
  *    aggregation (Casts.cents: partition-order-independent like the
  *    earlier decimal rule — mandatory for 100 TB where FP sums diverge
  *    with partition count — but codegen-primitive, measured ~20-26%
  *    faster than per-row BigDecimal on the revenue aggregates);
  *  - outputs come back via ONE IEEE division of the exact scaled sum
  *    (Casts.unscale) — bit-deterministic in both engines; averages add
  *    one more shared division by the count;
  *  - every output column carries an explicit final type + alias
  *    identical on both sides (DOUBLE or BIGINT — never DECIMAL, which
  *    the driver compare stringifies differently per engine);
  *  - every oracled query ends in a tie-free ORDER BY.
  */
object AggOps extends QueryModule {

  /** A1+A7+P2 flagship: TPC-H Q1 analog (pricing summary report).
    * Scale notes: single shuffle on a 6-value grouping key; partial
    * aggregation (map-side combine) makes the shuffle O(groups), not
    * O(rows). Survives 100 TB unchanged.
    *
    * Money math is integer-scaled (Casts.cents: exact long codegen for
    * the multiply chains — measured 26% faster than per-row BigDecimal
    * products on the w5 pilot, same exactness). This query's groups are
    * near-global (6 of them), so the PRODUCT sums widen their
    * accumulators to DECIMAL(38,0) per the bound documented in
    * Casts.cents: the multiplies stay primitive long, but each product
    * row does pay one long→decimal conversion + decimal add in the sum —
    * the price of staying exact past 2^63, mirroring DuckDB's automatic
    * HUGEINT sum. Plain cents sums (M ≈ 1.1e7/row) stay pure long. */
  val a1PricingSummary = QueryDef(
    "a1_pricing_summary",
    (s, d) => {
      val discCents = (cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).cast(DecimalType(38, 0))
      val chargeCents = (cents("l_extendedprice") * (lit(100L) - cents("l_discount")) * (lit(100L) + cents("l_tax"))).cast(DecimalType(38, 0))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampNTZType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          unscale(sum(cents("l_quantity")), 2).as("sum_qty"),
          unscale(sum(cents("l_extendedprice")), 2).as("sum_base_price"),
          unscale(sum(discCents), 4).as("sum_disc_price"),
          unscale(sum(chargeCents), 6).as("sum_charge"),
          (unscale(sum(cents("l_quantity")), 2) / count(lit(1))).as("avg_qty"),
          (unscale(sum(cents("l_extendedprice")), 2) / count(lit(1))).as("avg_price"),
          (unscale(sum(cents("l_discount")), 2) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
        sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
        sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS sum_disc_price,
        sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT)) * (100 + CAST(round(l_tax * 100) AS BIGINT))) / 1000000.0 AS sum_charge,
        sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 / count(*) AS avg_qty,
        sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 / count(*) AS avg_price,
        sum(CAST(round(l_discount * 100) AS BIGINT)) / 100.0 / count(*) AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """.stripMargin.trim),
  )

  /** A2: global (grouping-free) aggregate. One-row result; partial agg
    * means O(1) data crosses the final single-partition exchange. */
  val a2GlobalAgg = QueryDef(
    "a2_global_agg",
    (s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        unscale(sum(cents("l_extendedprice")), 2).as("total_price"),
        unscale(min(cents("l_extendedprice")), 2).as("min_price"),
        unscale(max(cents("l_extendedprice")), 2).as("max_price"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"),
      ),
    Some("""
      SELECT count(*) AS n_rows,
        sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS total_price,
        min(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS min_price,
        max(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS max_price,
        min(l_shipdate) AS first_ship,
        max(l_shipdate) AS last_ship
      FROM lineitem
    """.stripMargin.trim),
  )

  /** A3: exact COUNT(DISTINCT) — expands to a two-phase shuffle on
    * (group, value); still scalable because distinct values shard. */
  val a3CountDistinct = QueryDef(
    "a3_count_distinct",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows"),
        )
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag,
        count(DISTINCT l_suppkey) AS n_supp,
        count(DISTINCT l_partkey) AS n_part,
        count(*) AS n_rows
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """.stripMargin.trim),
  )

  /** A4: approximate distinct (HyperLogLog++). *no-oracle*: Spark's HLL
    * sketch differs from DuckDB's; exact equality is not defined. At scale
    * this replaces A3 when the value domain is huge: fixed-size sketch,
    * mergeable, single shuffle of O(groups × sketch). The accuracy
    * contract is graded IN-ENTRY at whatever sf the driver runs (the
    * l3d pattern): every group's estimate must land within 5% of the
    * exact count — a one-pass dual aggregation, so the gate costs one
    * extra agg column, not a second scan (SketchAccuracySpec holds the
    * deeper rsd-sweep claims). */
  val a4ApproxDistinct = QueryDef(
    "a4_approx_distinct",
    (s, d) => {
      val out = Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
          approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
        )
        .orderBy("l_returnflag")
      // the gate runs as its OWN exact pass (a3's cheap two-distinct
      // shape) — mixing countDistinct into the HLL agg above would
      // force the expand-based multi-distinct plan on the hot path
      // (measured 40x slower at sf0.1) — and ONCE per corpus dir (the
      // estimates are deterministic for a fixed input, so re-gating
      // every execution only re-proves the same arithmetic)
      graft.core.Once.gate(a4Gated, d) {
        val exact = Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            countDistinct(col("l_partkey")).as("exact_parts"),
            countDistinct(col("l_orderkey")).as("exact_orders"),
          )
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
        out.collect().foreach { r =>
          val (eParts, eOrders) = exact(r.getString(0))
          def gate(est: Long, ex: Long, what: String): Unit =
            require(ex == 0 || math.abs(est - ex).toDouble / ex <= 0.05,
              s"a4: $what estimate $est is >5% off exact $ex for flag ${r.getString(0)}")
          gate(r.getLong(1), eParts, "l_partkey")
          gate(r.getLong(2), eOrders, "l_orderkey")
        }
      }
      out
    },
    None,
  )

  /** A4b: EXACT-UNDER-CAPACITY sketch distinct (r16 verdict #5 — the
    * a13 pattern applied to distinct counting, giving the A4 row its
    * true hash oracle): per-group theta sketches built with a nominal
    * capacity ABOVE the value domain retain every hash (theta = 1.0),
    * so `estimate` IS the exact distinct count, and exact sketches
    * UNION exactly — the merged all-groups sketch equals the global
    * distinct. Both properties are `require`d in-entry at whatever sf
    * the entry runs ([[graft.core.ThetaNdv.isExact]]), so the DuckDB
    * twin is plain COUNT(DISTINCT) per group plus its global rollup —
    * a true hash oracle for a sketch entry. At 100 TB this is the
    * bounded-domain tier of the sketch ladder: dimension-keyed distinct
    * counts (suppliers, SKUs, country codes) stay EXACT at fixed
    * memory, and only unbounded domains pay the approximation.
    * Shuffle is O(partitions × groups × sketch), values never move
    * ([[graft.core.ThetaNdv.groupedSketches]]). */
  val a4bSketchDistinctExact = QueryDef(
    "a4b_sketch_distinct_exact",
    (s, d) => {
      import graft.core.ThetaNdv
      // lgK 18 (262 144 entries) covers the supplier domain (10 000 ×
      // sf) through sf ~26 — far past any bench sf here; the in-entry
      // exactness require turns a silent over-capacity decay into a
      // loud failure, not a wrong answer
      val cap = 1 << 18
      val perFlag = ThetaNdv.groupedSketches(
        Tables.lineitem(s, d).select("l_returnflag", "l_suppkey"),
        "l_returnflag", "l_suppkey", nominalEntries = cap)
      perFlag.foreach { case (g, b) =>
        require(ThetaNdv.isExact(b),
          s"a4b: sketch for flag $g sampled — raise capacity (the exact-under-capacity claim)")
      }
      val global = perFlag.values.reduce(ThetaNdv.union(_, _, cap))
      require(ThetaNdv.isExact(global),
        "a4b: the merged sketch must stay exact (exact sketches union exactly)")
      val rows = perFlag.toSeq.map { case (g, b) => (g, ThetaNdv.estimate(b)) } :+
        (("~all", ThetaNdv.estimate(global)))
      s.createDataFrame(rows).toDF("l_returnflag", "n_supp")
        .orderBy("l_returnflag")
    },
    Some("""
      SELECT l_returnflag, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp
      FROM lineitem GROUP BY l_returnflag
      UNION ALL
      SELECT '~all', CAST(count(DISTINCT l_suppkey) AS BIGINT) FROM lineitem
      ORDER BY l_returnflag
    """.stripMargin.trim),
  )

  /** Corpus dirs whose a4 accuracy gate already ran this session. */
  private val a4Gated = graft.core.Once.futures[java.lang.Boolean]()


  /** A12 (r15): ORDERED-SET / OCCURRENCE aggregates — Spark 4's
    * `listagg ... WITHIN GROUP` (deterministic because DISTINCT +
    * explicit order), `mode()` (the tag domain is constructed with a
    * strict majority winner, so ties never make the answer
    * engine-dependent), and `percentile_disc` (returns an EXACT element
    * of the group — no interpolation arithmetic to drift; at q=0.5 the
    * index rule ceil(N/2) agrees with DuckDB's floor((N-1)/2)+1 for
    * every N). All three are single-pass hash aggregates — same
    * shuffle shape as A1 at any scale. */
  val a12OrderedAgg = QueryDef(
    "a12_ordered_agg",
    (s, d) =>
      Tables.orders(s, d)
        .withColumn("tag", expr(
          "CASE WHEN o_orderkey % 4 = 0 THEN 'heavy' ELSE concat('p', o_orderkey % 7) END"))
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n_orders"),
          expr("listagg(DISTINCT o_orderpriority, ',') WITHIN GROUP (ORDER BY o_orderpriority)")
            .as("priorities"),
          expr("mode(tag)").as("top_tag"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("median_price"),
        )
        .orderBy("o_orderstatus"),
    Some("""
      SELECT o_orderstatus, count(*) AS n_orders,
        string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities,
        mode(CASE WHEN o_orderkey % 4 = 0 THEN 'heavy'
                  ELSE 'p' || CAST(o_orderkey % 7 AS VARCHAR) END) AS top_tag,
        quantile_disc(o_totalprice, 0.5) AS median_price
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """.stripMargin.trim),
  )

  /** A13: APPROX TOP-K (Spark 4's ApproxTopK sketch) — heavy-hitter
    * extraction in one pass, the 100 TB answer to "what dominates this
    * column" without a full groupBy+sort. EXACT-under-capacity oracle:
    * the sketch is exact whenever its tracked-item capacity covers the
    * column's distinct count (here 5 event types vs the 10 000
    * default), so the DuckDB twin is the plain top-3 — a true hash
    * oracle, unlike the rows-only sketch entries. The array result is
    * exploded and re-sorted so the sketch's internal tie order never
    * leaks into the graded rows — and the sketch is asked for MORE
    * items than the column's distinct count (10 vs 5) with the top-3
    * cut applied by an explicit Spark-side orderBy+limit (r16 ADVICE):
    * if two items tied exactly at the rank-3 boundary, the sketch's
    * internal selection could surface a different tied item than the
    * oracle's `ORDER BY count DESC, item` tie-break; cutting outside
    * the sketch makes both engines tie-break identically. */
  val a13ApproxTopK = QueryDef(
    "a13_approx_topk",
    (s, d) =>
      Tables.events(s, d)
        .agg(expr("approx_top_k(event_type, 10)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("event_type"), col("e.count").as("n_events"))
        .orderBy(col("n_events").desc, col("event_type"))
        .limit(3)
        .orderBy(col("n_events").desc, col("event_type")),
    Some("""
      SELECT event_type, count(*) AS n_events
      FROM events
      GROUP BY event_type
      ORDER BY n_events DESC, event_type
      LIMIT 3
    """.stripMargin.trim),
  )

  /** A13b: the MERGEABLE two-phase ApproxTopK surface
    * (`approx_top_k_accumulate` → `approx_top_k_combine` →
    * `approx_top_k_estimate`, Spark 4.1) — the a11 theta-rollup story
    * on the heavy-hitter sketch: per-shard sketches build where the
    * data lives, and only the FIXED-SIZE sketch states travel to the
    * final merge — the cube/rollup materialization pattern that makes
    * "top sellers per region AND overall" one pass at 100 TB instead
    * of a re-scan per grain. Same exact-under-capacity oracle as a13:
    * each shard sketch tracks more items than the column's distinct
    * count, and exact sketches merge exactly. The estimate pulls the
    * full tracked set (k=10 > 5 distinct) and the top-3 cut is an
    * explicit Spark-side orderBy+limit — rank-boundary ties break by
    * the same `count DESC, item` rule as the oracle (r16 ADVICE). */
  val a13bTopKRollup = QueryDef(
    "a13b_topk_rollup",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(expr("user_id % 4").as("shard"))
        .agg(expr("approx_top_k_accumulate(event_type, 100)").as("sk"))
        .agg(expr("approx_top_k_estimate(approx_top_k_combine(sk), 10)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("event_type"), col("e.count").as("n_events"))
        .orderBy(col("n_events").desc, col("event_type"))
        .limit(3)
        .orderBy(col("n_events").desc, col("event_type")),
    Some("""
      SELECT event_type, count(*) AS n_events
      FROM events
      GROUP BY event_type
      ORDER BY n_events DESC, event_type
      LIMIT 3
    """.stripMargin.trim),
  )

  /** A5: ROLLUP over two keys. NULL super-aggregate rows force explicit
    * NULLS FIRST on both sides (Spark defaults nulls-first, DuckDB
    * nulls-last — SURVEY R1). */
  val a5Rollup = QueryDef(
    "a5_rollup",
    (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(
          unscale(sum(cents("l_extendedprice")), 2).as("sum_price"),
          count(lit(1)).as("n_rows"),
        )
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some("""
      SELECT l_returnflag, l_linestatus,
        sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_price,
        count(*) AS n_rows
      FROM lineitem
      GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """.stripMargin.trim),
  )

  /** A5b: CUBE (all 4 grouping-set combinations). */
  val a5Cube = QueryDef(
    "a5_cube",
    (s, d) =>
      Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), unscale(sum(cents("o_totalprice")), 2).as("sum_total"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
    Some("""
      SELECT o_orderstatus, o_orderpriority,
        count(*) AS n_orders,
        sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_total
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """.stripMargin.trim),
  )

  /** A6: discrete percentiles via row_number — chosen over interpolating
    * percentile()/quantile_cont() because picking an existing value has
    * exact cross-engine parity while interpolation formulas differ in FP.
    * Same window SQL on both sides.
    */
  val a6Percentiles = QueryDef(
    "a6_percentiles",
    (s, d) => {
      val w = Window.partitionBy("l_returnflag").orderBy(col("l_quantity").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      val ranked = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("l_returnflag")))
      ranked
        .groupBy("l_returnflag")
        .agg(
          max(when(col("rn") === ceil(col("n") * 0.5), col("l_quantity"))).as("p50_qty"),
          max(when(col("rn") === ceil(col("n") * 0.9), col("l_quantity"))).as("p90_qty"),
          max(when(col("rn") === ceil(col("n") * 0.99), col("l_quantity"))).as("p99_qty"),
        )
        .orderBy("l_returnflag")
    },
    Some("""
      WITH ranked AS (
        SELECT l_returnflag, l_quantity,
          row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity ASC, l_orderkey ASC, l_linenumber ASC) AS rn,
          count(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem
      )
      SELECT l_returnflag,
        max(CASE WHEN rn = ceil(n * 0.5) THEN l_quantity END) AS p50_qty,
        max(CASE WHEN rn = ceil(n * 0.9) THEN l_quantity END) AS p90_qty,
        max(CASE WHEN rn = ceil(n * 0.99) THEN l_quantity END) AS p99_qty
      FROM ranked
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """.stripMargin.trim),
  )

  /** A6b: sketch-based percentiles — the 100 TB path. percentile() sorts
    * per group; percentile_approx streams a fixed-size t-digest-style
    * sketch that merges across partitions. *no-oracle* (sketch internals
    * differ per engine); a6 carries the exact-match score, and the
    * accuracy contract self-grades IN-ENTRY at any sf (the a4/l3d
    * pattern, once per corpus dir): each group's approximate p50/p95
    * must land within 2% relative of the exact percentile. */
  val a6Approx = QueryDef(
    "a6_approx_percentiles",
    (s, d) => {
      val out = Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("p50_approx"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000)).as("p95_price_approx"),
        )
        .orderBy("l_returnflag")
      graft.core.Once.gate(a6Gated, d) {
        val exact = Tables.lineitem(s, d)
          .groupBy("l_returnflag")
          .agg(
            expr("percentile(l_quantity, 0.5)").as("p50"),
            expr("percentile(l_extendedprice, 0.95)").as("p95"),
          )
          .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
        out.collect().foreach { r =>
          val (e50, e95) = exact(r.getString(0))
          def gate(est: Double, ex: Double, what: String): Unit =
            require(ex == 0d || math.abs(est - ex) / math.abs(ex) <= 0.02,
              s"a6b: $what approx $est is >2% off exact $ex for flag ${r.getString(0)}")
          gate(r.getDouble(1), e50, "p50(l_quantity)")
          gate(r.getDouble(2), e95, "p95(l_extendedprice)")
        }
      }
      out
    },
    None,
  )

  /** Corpus dirs whose a6b accuracy gate already ran this session. */
  private val a6Gated = graft.core.Once.futures[java.lang.Boolean]()

  /** A7: aggregate over a computed expression, keyed by supplier. */
  val a7AggExpr = QueryDef(
    "a7_agg_expr",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_suppkey")
        .agg(unscale(sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount"))), 4).as("revenue"))
        .orderBy("l_suppkey"),
    Some("""
      SELECT l_suppkey,
        sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
      FROM lineitem
      GROUP BY l_suppkey
      ORDER BY l_suppkey
    """.stripMargin.trim),
  )

  /** A9: HAVING — post-aggregation filter (TPC-H Q18 shape): orders whose
    * total quantity exceeds a threshold. */
  val a9Having = QueryDef(
    "a9_having",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(unscale(sum(cents("l_quantity")), 2).as("total_qty"), count(lit(1)).as("n_lines"))
        .filter(col("total_qty") > 150)
        .orderBy(col("total_qty").desc, col("l_orderkey").asc),
    Some("""
      SELECT l_orderkey,
        sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS total_qty,
        count(*) AS n_lines
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 > 150
      ORDER BY total_qty DESC, l_orderkey ASC
    """.stripMargin.trim),
  )

  /** A8: bounded collect — projected to a sorted joined string so the
    * compare hashes a scalar (list-typed outputs hash differently across
    * engines). collect_set is bounded by the tiny value domain. */
  val a8CollectSet = QueryDef(
    "a8_collect_set",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(array_join(array_sort(collect_set(col("l_linestatus"))), ",").as("statuses"))
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag,
        string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag
    """.stripMargin.trim),
  )

  /** A10: statistical moments — sample stddev and Pearson correlation
    * computed from EXACT integer moment sums (n, Σx, Σy, Σx², Σy², Σxy
    * over cent-scaled values, widened to DECIMAL(38,0) because Σx² can
    * exceed 2^63), with ONE final conversion to double. Built-in
    * stddev/corr stream Welford-style partial states whose floating-point
    * merge order varies with partitioning — not reproducible across
    * engines or even across partition counts; the moments formulation is
    * a plain partial+final integer aggregate: deterministic, one shuffle
    * of O(groups), and the identical arithmetic runs on the DuckDB side. */
  val a10Moments = QueryDef(
    "a10_stats_moments",
    (s, d) => {
      val qc = cents("l_quantity").cast(DecimalType(38, 0))
      val pc = cents("l_extendedprice").cast(DecimalType(38, 0))
      val n = col("n")
      val varQ = (n * col("sqq") - col("sq") * col("sq")).cast("double")
      val varP = (n * col("spp") - col("sp") * col("sp")).cast("double")
      val cov = (n * col("sqp") - col("sq") * col("sp")).cast("double")
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(qc).as("sq"), sum(pc).as("sp"),
          sum(qc * qc).as("sqq"), sum(pc * pc).as("spp"), sum(qc * pc).as("sqp"),
        )
        .select(
          col("l_returnflag"),
          n.as("n_rows"),
          // n*(n-1) as DOUBLE×DOUBLE: a long product wraps negative past
          // ~3e9 rows/group (exactly the scale this entry claims), and a
          // final-step double multiply is deterministic in both engines
          (sqrt(varQ / (n.cast("double") * (n - 1).cast("double"))) / 100.0).as("stddev_qty"),
          (cov / (sqrt(varQ) * sqrt(varP))).as("corr_qty_price"),
        )
        .orderBy("l_returnflag")
    },
    Some("""
      WITH m AS (
        SELECT l_returnflag,
          count(*) AS n,
          sum(qc) AS sq, sum(pc) AS sp,
          sum(qc * qc) AS sqq, sum(pc * pc) AS spp, sum(qc * pc) AS sqp
        FROM (
          SELECT l_returnflag,
            CAST(round(l_quantity * 100) AS BIGINT) AS qc,
            CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
          FROM lineitem
        )
        GROUP BY l_returnflag
      )
      SELECT l_returnflag,
        n AS n_rows,
        sqrt(CAST(n * sqq - sq * sq AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) / 100.0 AS stddev_qty,
        CAST(n * sqp - sq * sp AS DOUBLE)
          / (sqrt(CAST(n * sqq - sq * sq AS DOUBLE)) * sqrt(CAST(n * spp - sp * sp AS DOUBLE))) AS corr_qty_price
      FROM m
      ORDER BY l_returnflag
    """.stripMargin.trim),
  )

  /** A11: MERGEABLE-SKETCH ROLLUP — the distinct-count rollup pattern a
    * 100 TB event store runs nightly: per-day THETA sketches of
    * `user_id` in ONE distributed pass ([[graft.core.ThetaNdv
    * .groupedSketches]] — partial sketches union partition-side,
    * O(days × sketch) driver bytes, never values), then week and
    * global distincts derived by UNIONING the daily sketches without
    * re-touching a single row. That re-aggregability is the whole
    * point: exact `count(DISTINCT)` cannot roll up (distinct is not
    * summable across windows — every new window is a full re-scan),
    * sketches make every coarser window O(sketches). In-entry gates
    * (the a4 accuracy pattern): per-week sketch-union estimates and
    * the global union estimate must sit within 2% of the exact counts
    * computed alongside — at these cardinalities (well under the
    * sketch's 4096-entry exact region) the union is provably exact,
    * so the gate catches structural regressions, not luck. Oracle: the
    * EXACT weekly aggregate straight off `events`. */
  val a11SketchRollup = QueryDef(
    "a11_sketch_rollup",
    (s, d) => {
      val T = graft.core.ThetaNdv
      // Tables.events surfaces ts as an epoch-NANOS long (G2); the
      // session is pinned UTC, so the date derivation matches DuckDB's
      val ev = Tables.events(s, d)
        .select(expr("to_date(timestamp_micros(ts div 1000))").as("day"), col("user_id"))
        .filter(col("user_id").isNotNull)
      val daily: Map[String, Array[Byte]] = T.groupedSketches(ev, "day", "user_id")
      def weekOf(day: String): Long =
        java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse("2024-01-01"), java.time.LocalDate.parse(day)) / 7
      // day → week → global: pure sketch unions, zero data re-reads
      val weekly: Map[Long, Array[Byte]] =
        daily.groupBy { case (day, _) => weekOf(day) }
          .map { case (w, sks) => w -> sks.values.reduce(T.union(_, _)) }
      val globalEst = T.estimate(weekly.values.reduce(T.union(_, _)))
      val exact = ev
        .groupBy(floor(datediff(col("day"), lit("2024-01-01")) / 7).cast("long").as("week"))
        .agg(count(lit(1)).as("n_events"), countDistinct(col("user_id")).as("n_users"))
        .orderBy("week")
      val exactRows = exact.collect()
      exactRows.foreach { r =>
        val (w, n) = (r.getLong(0), r.getLong(2))
        val est = T.estimate(weekly(w))
        require(math.abs(est - n) <= math.max(1L, n / 50),
          s"a11: week $w sketch-union estimate $est vs exact $n (>2% off)")
      }
      val globalExact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
      require(math.abs(globalEst - globalExact) <= math.max(1L, globalExact / 50),
        s"a11: global sketch-union estimate $globalEst vs exact $globalExact (>2% off)")
      val rows = exactRows.map(r => org.apache.spark.sql.Row(r.get(0), r.get(1), r.get(2)))
      s.createDataFrame(java.util.Arrays.asList(rows: _*), exact.schema)
    },
    Some("""
      SELECT CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7.0) AS BIGINT) AS week,
        count(*) AS n_events,
        count(DISTINCT user_id) AS n_users
      FROM events
      WHERE user_id IS NOT NULL
      GROUP BY 1
      ORDER BY 1
    """.stripMargin.trim),
  )

  def defs: Seq[QueryDef] = Seq(
    a1PricingSummary, a2GlobalAgg, a3CountDistinct, a4ApproxDistinct,
    a4bSketchDistinctExact,
    a5Rollup, a5Cube, a6Percentiles, a6Approx, a7AggExpr, a8CollectSet, a9Having,
    a10Moments, a11SketchRollup, a12OrderedAgg, a13ApproxTopK, a13bTopKRollup,
  )
}
