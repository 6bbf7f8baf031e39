package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-money helpers enforcing SURVEY.md rules R2/R3: money columns in
  * the corpus are `double`, and floating-point aggregation depends on
  * partition order — so every oracled aggregate converts to an EXACT
  * representation *before* aggregating, and every output column gets an
  * explicit final type so the Spark schema matches the DuckDB oracle
  * schema exactly. At 100 TB this is also the right call for
  * correctness: money math in binary FP accumulates error proportional
  * to partition count.
  *
  * Two exact tiers:
  *  - [[cents]]/[[unscale]] — integer-scaled longs, the PREFERRED path:
  *    same exactness/associativity as decimal, but primitive codegen
  *    arithmetic (measured 20-26% faster on the revenue aggregates).
  *  - [[dec2]]/[[money2]] — decimal casts, retained for
  *    comparisons/filters where a typed decimal reads better. When a
  *    scaled long SUM can exceed 2^63 (see the bound under [[cents]]),
  *    widen the accumulator: `sum(longProduct.cast(DecimalType(38,0)))`
  *    keeps the multiply chain primitive and mirrors DuckDB's HUGEINT.
  *
  * Output-type rule (root cause of 26 of round 1's 30 hash mismatches):
  * every output column must be DOUBLE or BIGINT, never DECIMAL — the
  * driver's compare stringifies a Spark DECIMAL with trailing zeros
  * ("155.00") but reads the DuckDB value as float64 ("155.0"), failing
  * the hash on numerically-equal values.
  */
object Casts {
  /** DECIMAL(12,2) — money columns (verified ≤2 fractional digits, values
    * < 1e10; kept narrow so DuckDB's INT64 decimal path never overflows on
    * products). */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  def dec2(name: String): Column = dec2(col(name))

  /** Scale-reducing money output: round(x, 2) is half-away-from-zero in
    * both Spark and DuckDB (verified live), unlike cast (Spark rounds
    * HALF_UP, DuckDB truncates — never cast to reduce decimal scale). */
  def money2(c: Column): Column = round(c, 2).cast("double")

  /** Exact average: CAST(exact_decimal_sum AS DOUBLE) / count — one IEEE
    * division of bit-identical inputs, deterministic in both engines. */
  def avgOf(sumExact: Column, cnt: Column): Column =
    sumExact.cast("double") / cnt

  /** Integer-scaled money: a ≤2-decimal double becomes exact integral
    * cents in one primitive round+cast. Sums and products then run as
    * codegen'd long arithmetic — the same exactness (and partition-order
    * independence) as the decimal path without BigDecimal per row, which
    * profiling showed dominates the revenue-style aggregates.
    *
    * OVERFLOW BOUND — row-count driven, per GROUP (a long SUM holds the
    * group total): with per-row values ≤ M, the sum is exact while
    * rows-per-group < 2^63/M. This corpus: plain cents M ≈ 1.1e7 → safe
    * to ~8e11 rows/group; 10^4-scaled products (price_c × rate) M ≈
    * 1.2e9 → ~7e9 rows/group. A near-global group over a 100 TB fact
    * table can exceed the latter, so ungrouped/near-global product sums
    * must widen their ACCUMULATOR to DECIMAL(38,0) (multiply chain stays
    * primitive; mirrors DuckDB's automatic HUGEINT sum) — see
    * a1_pricing_summary / j2_promo_share. Mirror in SQL:
    * `CAST(round(x * 100) AS BIGINT)`. */
  def cents(c: Column): Column = round(c * 100).cast("long")
  def cents(name: String): Column = cents(col(name))

  /** Back from a 10^scale-scaled exact long sum to a double: ONE IEEE
    * division of identical inputs → bit-identical in both engines. No
    * round() here on purpose — rounding a DOUBLE at a .xx5 boundary is
    * engine-divergent (Spark rounds the shortest decimal repr, DuckDB
    * the binary value), while the raw quotient is always safe. */
  def unscale(sumScaled: Column, scale: Int): Column =
    sumScaled.cast("double") / math.pow(10, scale)
}
