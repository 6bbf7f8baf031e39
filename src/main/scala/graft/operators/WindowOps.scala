package graft.operators

import graft.core._
import graft.core.Casts._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function battery — SURVEY.md §2.5 rows W1–W5.
  *
  * Windows shuffle once on the partition key and sort within partitions;
  * at 100 TB the key (nation, user) must have enough cardinality to
  * shard — true for all entries here. Every ORDER BY inside a window is
  * made tie-free with a key suffix so both engines rank identically
  * (SURVEY R1 applies inside windows too).
  */
object WindowOps extends QueryModule {

  /** W1: ranking family — row_number / rank / dense_rank / ntile over
    * customers ranked by balance within their nation. */
  val w1Ranking = QueryDef(
    "w1_ranking",
    (s, d) => {
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, d)
        .select(
          col("c_nationkey"), col("c_custkey"), col("c_acctbal").as("acctbal"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"),
          ntile(4).over(w).as("quartile"),
        )
        .orderBy("c_nationkey", "rn")
    },
    Some("""
      SELECT c_nationkey, c_custkey, c_acctbal AS acctbal,
        row_number() OVER w AS rn,
        rank() OVER w AS rk,
        dense_rank() OVER w AS drk,
        ntile(4) OVER w AS quartile
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
      ORDER BY c_nationkey, rn
    """.stripMargin.trim),
  )

  /** W1b: distribution family — percent_rank / cume_dist / nth_value.
    * percent_rank is (rank-1)/(n-1) and cume_dist is peers/n — single
    * IEEE divisions of exact integers, deterministic in both engines. */
  val w1bDistribution = QueryDef(
    "w1b_distribution",
    (s, d) => {
      val w = Window.partitionBy("c_nationkey").orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, d)
        .select(
          col("c_nationkey"), col("c_custkey"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"),
          nth_value(col("c_custkey"), 2).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("second_richest"),
        )
        .orderBy("c_nationkey", "pct_rank", "c_custkey")
    },
    Some("""
      SELECT c_nationkey, c_custkey,
        percent_rank() OVER w AS pct_rank,
        cume_dist() OVER w AS cume,
        nth_value(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_richest
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
      ORDER BY c_nationkey, pct_rank, c_custkey
    """.stripMargin.trim),
  )

  /** W2: lag/lead — per-user gap between consecutive events (micros). */
  val w2LagLead = QueryDef(
    "w2_lag_lead",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("us", expr("ts div 1000"))
        .select(
          col("user_id"), col("event_id"), col("us"),
          lag(col("us"), 1).over(w).as("prev_us"),
          lead(col("us"), 1).over(w).as("next_us"),
          (col("us") - lag(col("us"), 1).over(w)).as("gap_us"),
        )
        .orderBy("user_id", "us", "event_id")
    },
    Some("""
      SELECT user_id, event_id, epoch_us(ts) AS us,
        lag(epoch_us(ts), 1) OVER w AS prev_us,
        lead(epoch_us(ts), 1) OVER w AS next_us,
        epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)
      ORDER BY user_id, us, event_id
    """.stripMargin.trim),
  )

  /** W2b: first/last family — first_value / last_value over a running
    * frame, plus an IGNORE NULLS variant over a deterministically
    * nulled column (value of 'click' events only). */
  val w2bFirstLast = QueryDef(
    "w2b_first_last",
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("us").asc, col("event_id").asc)
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("us", expr("ts div 1000"))
        .withColumn("click_value", when(col("event_type") === "click", col("value")))
        .select(
          col("user_id"), col("event_id"),
          first(col("event_id")).over(run).as("first_event"),
          last(col("event_id")).over(run).as("latest_event"),
          last(col("click_value"), ignoreNulls = true).over(run).as("last_click_value"),
        )
        .orderBy("user_id", "us", "event_id")
    },
    Some("""
      SELECT user_id, event_id,
        first_value(event_id) OVER run AS first_event,
        last_value(event_id) OVER run AS latest_event,
        last_value(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS) OVER run AS last_click_value
      FROM events
      WINDOW run AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY user_id, epoch_us(ts), event_id
    """.stripMargin.trim),
  )

  /** W3: frame aggregates — running sum + 3-row moving average per
    * customer over their order history. Frames sum exact integer-scaled
    * cents (Casts.cents); the moving average divides the scaled frame
    * sum by 100 and the frame row count — the same IEEE divisions on
    * both engines. */
  val w3RunningFrames = QueryDef(
    "w3_running_frames",
    (s, d) => {
      val ord = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = ord.rowsBetween(-2, 0)
      Tables.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          unscale(sum(cents("o_totalprice")).over(run), 2).as("running_total"),
          (unscale(sum(cents("o_totalprice")).over(mov), 2) / count(lit(1)).over(mov)).as("moving_avg3"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_orderdate,
        sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER run / 100.0 AS running_total,
        sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER mov / 100.0 / count(*) OVER mov AS moving_avg3
      FROM orders
      WINDOW
        run AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        mov AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderdate, o_orderkey
    """.stripMargin.trim),
  )

  /** W4: RANGE frame over a numeric (micros) ordering — events within the
    * trailing hour per user. RANGE frames need a single ordering
    * expression; value ties are fine because the frame is value-based. */
  val w4RangeFrame = QueryDef(
    "w4_range_frame",
    (s, d) => {
      val hour = 3600L * 1000000L
      val w = Window.partitionBy("user_id").orderBy(col("us")).rangeBetween(-hour, 0)
      Tables.events(s, d)
        .withColumn("us", expr("ts div 1000"))
        .select(
          col("user_id"), col("event_id"), col("us"),
          count(lit(1)).over(w).as("events_last_hour"),
          unscale(sum(cents("value")).over(w), 2).as("value_last_hour"),
        )
        .orderBy("user_id", "us", "event_id")
    },
    Some("""
      SELECT user_id, event_id, epoch_us(ts) AS us,
        count(*) OVER w AS events_last_hour,
        sum(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0 AS value_last_hour
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, us, event_id
    """.stripMargin.trim),
  )

  /** W5: top-k per group — 3 highest-revenue parts per brand. Money math
    * runs integer-scaled (cents × (100−disc%), exact long codegen — see
    * Casts.cents) instead of per-row BigDecimal, which dominated this
    * query's profile; the single final division (deliberately NO round —
    * see Casts.unscale) is shared IEEE arithmetic on both engines, so
    * hash parity holds. */
  val w5TopKPerGroup = QueryDef(
    "w5_topk_per_group",
    (s, d) => {
      val rev = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_partkey")
        .agg(unscale(sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount"))), 4).as("revenue"))
      val w = Window.partitionBy("p_brand").orderBy(col("revenue").desc, col("p_partkey").asc)
      rev
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("p_brand", "rn")
    },
    Some("""
      WITH rev AS (
        SELECT p_brand, p_partkey,
          sum(CAST(round(l_extendedprice * 100) AS BIGINT) * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand, p_partkey
      )
      SELECT p_brand, p_partkey, revenue, rn FROM (
        SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey ASC) AS rn
        FROM rev
      ) x
      WHERE rn <= 3
      ORDER BY p_brand, rn
    """.stripMargin.trim),
  )

  def defs: Seq[QueryDef] = Seq(w1Ranking, w1bDistribution, w2LagLead, w2bFirstLast, w3RunningFrames, w4RangeFrame, w5TopKPerGroup)
}
