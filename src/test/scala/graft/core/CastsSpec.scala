package graft.core

import graft.SparkFixture
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property coverage for the money path (~30 oracles ride on it):
  * cents() must be EXACT for any ≤2-decimal value in the corpus range,
  * and unscale() must invert it through one IEEE division. Uses
  * scalacheck generators with the real Spark expressions batched into
  * one job per property (a job per sample would take minutes). */
class CastsSpec extends AnyFunSuite with SparkFixture {

  // values like the corpus money columns: up to 9 digits + 2 decimals,
  // both signs (discounts/adjustments can be negative)
  private val centsGen: Gen[Long] = Gen.chooseNum(-99999999999L, 99999999999L)

  test("cents() is exact for any 2-decimal double in corpus range (500 samples)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val samples = Gen.listOfN(500, centsGen).sample.get
    val got = samples.map(c => c / 100.0).toDF("x")
      .select(Casts.cents(col("x")).as("c")).collect().map(_.getLong(0))
    assert(got.toSeq == samples, "cents() drifted from the exact integral representation")
  }

  test("unscale(sum(cents)) equals the exact integer sum over one division (50 groups)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val groups = Gen.listOfN(50, Gen.nonEmptyListOf(centsGen)).sample.get
    val df = groups.zipWithIndex
      .flatMap { case (cs, g) => cs.map(c => (g, c / 100.0)) }
      .toDF("g", "x")
      .groupBy("g").agg(Casts.unscale(sum(Casts.cents(col("x"))), 2).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for ((cs, g) <- groups.zipWithIndex) {
      // the reference result: exact integer sum, ONE division — the same
      // arithmetic DuckDB's HUGEINT sum / 100.0 performs
      assert(df(g) == cs.sum.toDouble / 100.0, s"group $g diverged")
    }
  }

  test("avgOf is the exact-sum-over-count division (FP-trap triple)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 0.1 + 0.2 + 0.3 in doubles is 0.6000000000000001; through exact
    // cents the sum is the integer 60 and the average exactly 20 cents
    val got = Seq(0.1, 0.2, 0.3).toDF("x")
      .agg(Casts.avgOf(sum(Casts.cents(col("x")).cast("decimal(38,0)")), count(lit(1))).as("a"))
      .collect().head.getDouble(0)
    assert(got == 20.0, "exact cents sum (60) over 3 rows must be exactly 20 cents")
  }
}
