package graft.operators

import graft.core._
import graft.core.Casts._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Sorts / limits / set operations — SURVEY.md §2.6 (O1–O2) and §2.7
  * (U1–U3). Global sorts use Spark's range-partitioned exchange (sampled
  * boundaries → balanced partitions at any scale); top-k compiles to
  * TakeOrderedAndProject (per-partition heaps, no full sort).
  */
object SetSortOps extends QueryModule {

  private def custkeysOfYear(s: org.apache.spark.sql.SparkSession, d: String, y0: String, y1: String) =
    Tables.orders(s, d)
      .filter(
        col("o_orderdate") >= lit(s"$y0-01-01 00:00:00").cast(TimestampNTZType) &&
          col("o_orderdate") < lit(s"$y1-01-01 00:00:00").cast(TimestampNTZType))
      .select("o_custkey")

  /** O1: multi-key global sort, mixed asc/desc. */
  val o1SortMulti = QueryDef(
    "o1_sort_multi",
    (s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal").as("acctbal"))
        .orderBy(col("c_mktsegment").asc, col("acctbal").desc, col("c_custkey").asc),
    Some("""
      SELECT c_custkey, c_mktsegment, c_acctbal AS acctbal
      FROM customer
      ORDER BY c_mktsegment ASC, acctbal DESC, c_custkey ASC
    """.stripMargin.trim),
  )

  /** O2: global top-k — TakeOrderedAndProject, not a full sort. */
  val o2TopK = QueryDef(
    "o2_topk",
    (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_totalprice").as("totalprice"))
        .orderBy(col("totalprice").desc, col("o_orderkey").asc)
        .limit(25),
    Some("""
      SELECT o_orderkey, o_totalprice AS totalprice
      FROM orders
      ORDER BY totalprice DESC, o_orderkey ASC
      LIMIT 25
    """.stripMargin.trim),
  )

  /** U1: UNION ALL + distinct aggregation across two filtered branches. */
  val u1Union = QueryDef(
    "u1_union",
    (s, d) =>
      custkeysOfYear(s, d, "1996", "1997").withColumn("yr", lit(1996))
        .unionByName(custkeysOfYear(s, d, "1997", "1998").withColumn("yr", lit(1997)))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), countDistinct(col("yr")).as("n_years"))
        .orderBy("o_custkey"),
    Some("""
      SELECT o_custkey, count(*) AS n_orders, count(DISTINCT yr) AS n_years
      FROM (
        SELECT o_custkey, 1996 AS yr FROM orders
          WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        UNION ALL
        SELECT o_custkey, 1997 AS yr FROM orders
          WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      ) u
      GROUP BY o_custkey
      ORDER BY o_custkey
    """.stripMargin.trim),
  )

  /** U2a: INTERSECT — customers ordering in both years. */
  val u2Intersect = QueryDef(
    "u2_intersect",
    (s, d) =>
      custkeysOfYear(s, d, "1996", "1997")
        .intersect(custkeysOfYear(s, d, "1997", "1998"))
        .orderBy("o_custkey"),
    Some("""
      SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      INTERSECT
      SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      ORDER BY o_custkey
    """.stripMargin.trim),
  )

  /** U2b: EXCEPT — customers ordering in 1996 but not 1997. */
  val u2Except = QueryDef(
    "u2_except",
    (s, d) =>
      custkeysOfYear(s, d, "1996", "1997")
        .except(custkeysOfYear(s, d, "1997", "1998"))
        .orderBy("o_custkey"),
    Some("""
      SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      EXCEPT
      SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      ORDER BY o_custkey
    """.stripMargin.trim),
  )

  /** U2c: INTERSECT ALL — bag semantics (duplicates preserved up to the
    * min multiplicity on each side). */
  val u2IntersectAll = QueryDef(
    "u2_intersect_all",
    (s, d) =>
      Tables.orders(s, d).select("o_orderstatus", "o_orderpriority")
        .intersectAll(
          Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1998-01-01 00:00:00").cast(TimestampNTZType))
            .select("o_orderstatus", "o_orderpriority"))
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("multiplicity"))
        .orderBy("o_orderstatus", "o_orderpriority"),
    Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS multiplicity
      FROM (
        SELECT o_orderstatus, o_orderpriority FROM orders
        INTERSECT ALL
        SELECT o_orderstatus, o_orderpriority FROM orders
          WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      ) x
      GROUP BY o_orderstatus, o_orderpriority
      ORDER BY o_orderstatus, o_orderpriority
    """.stripMargin.trim),
  )

  /** U2d: EXCEPT ALL — bag difference (each row's multiplicity is
    * max(0, left − right)); projected through a counting aggregate so
    * the compare hashes a deterministic set. */
  val u2ExceptAll = QueryDef(
    "u2_except_all",
    (s, d) =>
      Tables.orders(s, d).select("o_orderstatus", "o_orderpriority")
        .exceptAll(
          Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1995-01-01 00:00:00").cast(TimestampNTZType))
            .select("o_orderstatus", "o_orderpriority"))
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("multiplicity"))
        .orderBy("o_orderstatus", "o_orderpriority"),
    Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS multiplicity
      FROM (
        SELECT o_orderstatus, o_orderpriority FROM orders
        EXCEPT ALL
        SELECT o_orderstatus, o_orderpriority FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      ) x
      GROUP BY o_orderstatus, o_orderpriority
      ORDER BY o_orderstatus, o_orderpriority
    """.stripMargin.trim),
  )

  /** U3: DISTINCT on a projection. (Deterministic subset-dedup that keeps
    * a canonical row per key is L1's row_number pattern — dropDuplicates'
    * "first row wins" is partition-order-dependent and never oracled.) */
  val u3Distinct = QueryDef(
    "u3_distinct",
    (s, d) =>
      Tables.orders(s, d)
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority"),
    Some("""
      SELECT DISTINCT o_orderstatus, o_orderpriority
      FROM orders
      ORDER BY o_orderstatus, o_orderpriority
    """.stripMargin.trim),
  )

  def defs: Seq[QueryDef] = Seq(
    o1SortMulti, o2TopK, u1Union, u2Intersect, u2Except, u2IntersectAll, u2ExceptAll, u3Distinct,
  )
}
