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
  *  - [[dec2]]/[[rate]]/[[money2]]/[[asMoney]] — decimal casts, retained
  *    for comparisons/filters where a typed decimal reads better and for
  *    accumulators whose scaled products exceed long range.
  */
object Casts {
  /** DECIMAL(12,2) — money columns (verified ≤2 fractional digits, values
    * < 1e10; kept narrow so DuckDB's INT64 decimal path never overflows on
    * products). */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
  def dec2(name: String): Column = dec2(col(name))

  /** DECIMAL(4,2) — rate columns (discount, tax: verified ≤2 fractional
    * digits, < 1). Narrow width keeps decimal products exact and small. */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))
  def rate(name: String): Column = rate(col(name))

  /** Literal 1 at rate scale: (1 - rate) stays a narrow exact decimal. */
  def one: Column = lit(1).cast(DecimalType(3, 2))

  /** DECIMAL(9,6) — exact pre-aggregation cast feeding average formulas. */
  def dec6(c: Column): Column = c.cast(DecimalType(9, 6))
  def dec6(name: String): Column = dec6(col(name))

  /** Final output cast for money sums: the aggregation is exact decimal
    * (order-independent), then ONE cast to double for output. Both engines
    * convert decimal→double correctly-rounded, and the scaled integer fits
    * in 2^53 at every tested SF, so the result is bit-identical — unlike a
    * DECIMAL output, which the driver's compare stringifies with trailing
    * zeros on the Spark side ("155.00") but as float64 ("155.0") from
    * DuckDB's .df(), failing the hash on numerically-equal values
    * (root cause of 26 of round 1's 30 hash mismatches).
    * NEVER cast to *reduce* decimal scale before this: Spark casts round
    * HALF_UP while DuckDB casts truncate — use [[money2]] instead. */
  def asMoney(c: Column): Column = c.cast("double")

  /** Scale-reducing money output: round(x, 2) is half-away-from-zero in
    * both Spark and DuckDB (verified live), unlike cast. */
  def money2(c: Column): Column = round(c, 2).cast("double")

  /** Exact average: CAST(exact_decimal_sum AS DOUBLE) / count — one IEEE
    * division of bit-identical inputs, deterministic in both engines. */
  def avgOf(sumExact: Column, cnt: Column): Column =
    sumExact.cast("double") / cnt

  def asBigint(c: Column): Column = c.cast("long")

  /** Integer-scaled money: a ≤2-decimal double becomes exact integral
    * cents in one primitive round+cast. Sums and products then run as
    * codegen'd long arithmetic — the same exactness (and partition-order
    * independence) as the decimal path without BigDecimal per row, which
    * profiling showed dominates the revenue-style aggregates. Bounds: a
    * cents value ≤ 1e9 and 600k-row sums of cents×rate products stay
    * ≤ ~1e15, far inside Long range; revisit scales if a fact table's
    * money exceeds ~9e16 cents. Mirror in SQL:
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
