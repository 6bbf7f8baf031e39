package graft

import org.scalatest.funsuite.AnyFunSuite

/** Accuracy/determinism coverage for the rows-only entries whose output
  * no DuckDB oracle can reproduce (sketches and seeded sampling). Each
  * rows-only entry must be graded by SOMETHING — these tests bound the
  * approximations against their exact oracled twins. (The remaining
  * rows-only entries — l2/l2b hash families and l3d IVF — are covered by
  * DedupSpec and SimilaritySpec respectively.) */
class SketchAccuracySpec extends AnyFunSuite with SparkFixture {

  test("a4_approx_distinct: HLL estimates within rsd bounds of exact a3 counts") {
    val approx = SparkEntry.queries("a4_approx_distinct")(spark, sf())
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = SparkEntry.queries("a3_count_distinct")(spark, sf())
      .collect().map(r => r.getString(0) -> (r.getLong(2), /* n_part */ 0L)).toMap
    // a4 estimates (parts, orders) at rsd=0.01; allow 5x rsd slack (5%)
    val exactOrders = graft.core.Tables.lineitem(spark, sf())
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct(
        org.apache.spark.sql.functions.col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((flag, (apxParts, apxOrders)) <- approx) {
      val exParts = exact(flag)._1
      assert(math.abs(apxParts - exParts).toDouble / exParts <= 0.05,
        s"$flag: approx parts $apxParts vs exact $exParts drifts >5%")
      assert(math.abs(apxOrders - exactOrders(flag)).toDouble / exactOrders(flag) <= 0.05,
        s"$flag: approx orders $apxOrders vs exact ${exactOrders(flag)} drifts >5%")
    }
  }

  test("a11: grouped theta sketches union exactly below the sketch's exact region") {
    import org.apache.spark.sql.functions.{col, countDistinct, expr}
    val T = graft.core.ThetaNdv
    val ev = graft.core.Tables.events(spark, sf())
      .select(expr("to_date(timestamp_micros(ts div 1000))").as("day"), col("user_id"))
      .filter(col("user_id").isNotNull)
    val daily = T.groupedSketches(ev, "day", "user_id")
    assert(daily.nonEmpty)
    // per-day estimates are EXACT below 4096 distinct (theta keeps all hashes)
    val exactDaily = ev.groupBy("day").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    exactDaily.foreach { case (day, n) =>
      assert(T.estimate(daily(day)) == n, s"day $day sketch must be exact at this cardinality")
    }
    // union order must not matter (mergeability): forward == reversed == exact global
    val global = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    val fwd = T.estimate(daily.values.reduce(T.union(_, _)))
    val rev = T.estimate(daily.values.toSeq.reverse.reduce(T.union(_, _)))
    assert(fwd == global && rev == global,
      s"sketch union must be order-independent and exact here ($fwd/$rev vs $global)")
  }

  test("a6_approx_percentiles: sketch p50 lands within the exact p40..p60 band") {
    import org.apache.spark.sql.functions._
    val approx = SparkEntry.queries("a6_approx_percentiles")(spark, sf())
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // exact rank band per flag from the raw data (same tie-free ordering
    // a6_percentiles uses)
    val bands = graft.core.Tables.lineitem(spark, sf())
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.40)").as("lo"),
        expr("percentile(l_quantity, 0.60)").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for ((flag, p50) <- approx) {
      val (lo, hi) = bands(flag)
      assert(p50 >= lo && p50 <= hi,
        s"$flag: approx p50 $p50 outside exact p40..p60 band [$lo, $hi]")
    }
  }

  test("r4_sample: seeded sample is deterministic and near the expected fraction") {
    val fn = SparkEntry.queries("r4_sample")
    val first = fn(spark, sf()).collect().head
    val second = fn(spark, sf()).collect().head
    assert(first.toSeq == second.toSeq, "seeded sample drifts between runs")
    val n = graft.core.Tables.lineitem(spark, sf()).count()
    val sampled = first.getLong(0)
    // fraction 0.1; Bernoulli sampling → ±5 sigma binomial band
    val sigma = math.sqrt(n * 0.1 * 0.9)
    assert(math.abs(sampled - n * 0.1) <= 5 * sigma,
      s"sampled $sampled of $n far from 10% (±5σ=$sigma)")
  }
}
