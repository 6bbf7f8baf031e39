package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared scale idioms — extracted (r3 review) from their original call
  * sites so the shapes PlanAuditSpec locks live in ONE place.
  */
object ScaleOps {

  /** Run `body` with `spark.sql.shuffle.partitions` pinned to `n`,
    * restoring the caller's value (or unset state) afterwards. For
    * eagerly-executing blocks whose data volume is far below the
    * session's width: stateful streaming drains (state-store shards
    * can't be AQE-coalesced) and bounded-slice iterative loops. Only
    * jobs that RUN inside `body` are affected — a lazily-returned plan
    * executes later under the restored conf. */
  def withShuffleWidth[A](s: SparkSession, n: Int)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val previous = s.conf.getOption(key)
    s.conf.set(key, n.toString)
    try body
    finally previous match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** Two-pass chunked prefix aggregate — the scale-safe form of "agg over
    * all rows strictly before me in `idCol` order" (a running max/sum):
    * an unpartitioned window would collapse the whole input into one
    * task, so dense ids are ranged into `chunkSize`-wide chunks; pass 1
    * aggregates within each chunk (hash partitioned, fully parallel),
    * pass 2 runs the same aggregate over the per-chunk totals — 1/chunkSize
    * of the data, the only single-partition step. The chunk-key join
    * reuses pass 1's partitioning.
    *
    * Returns `df` plus two columns: `localName` (agg over earlier rows in
    * MY chunk; NULL for chunk-first rows) and `prefixName` (agg over all
    * earlier chunks; NULL in the first chunk). The caller merges them
    * with its aggregate's identity (greatest for max, coalesce+sum for
    * sum). Locked by PlanAuditSpec: hashpartitioning(__chunk...) present,
    * ≤1 SinglePartition exchange.
    *
    * CONTRACT: `idCol` values must be UNIQUE — "strictly before me" is
    * only well-defined under a total order, so duplicate ids make the
    * rows-frame windows nondeterministic (Spark gives no stable
    * tie-break). Uniqueness is the caller's invariant (both in-repo
    * callers key on dense event/doc ids); it is not checked here because
    * the check would cost a full extra aggregate per call. Negative ids
    * ARE handled: chunking uses floor division, so negatives land in
    * their own descending chunks instead of folding into chunk 0 with
    * the positives (truncating `div` would break the earlier-chunk ⇒
    * smaller-id invariant the prefix pass depends on).
    */
  def chunkedPrefix(
      df: DataFrame,
      idCol: String,
      valCol: String,
      chunkSize: Long,
      aggFn: Column => Column,
      localName: String,
      prefixName: String,
  ): DataFrame = {
    require(chunkSize > 0, s"chunkedPrefix: chunkSize must be positive, got $chunkSize")
    // floor division in long arithmetic (no double round-trip — ids past
    // 2^53 would lose precision): truncating `div` rounds toward zero,
    // so correct it by one chunk when a negative id has a remainder
    val chunked = df.withColumn(
      "__chunk",
      expr(s"($idCol div $chunkSize) - (CASE WHEN $idCol % $chunkSize < 0 THEN 1 ELSE 0 END)"))
    val wLocal = Window.partitionBy("__chunk").orderBy(col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wPrefix = Window.orderBy(col("__chunk").asc).rowsBetween(Window.unboundedPreceding, -1)
    val prefix = chunked.groupBy("__chunk").agg(aggFn(col(valCol)).as("__chunk_agg"))
      .withColumn(prefixName, aggFn(col("__chunk_agg")).over(wPrefix))
      .select(col("__chunk"), col(prefixName))
    chunked
      .withColumn(localName, aggFn(col(valCol)).over(wLocal))
      .join(prefix, Seq("__chunk"))
      .drop("__chunk")
  }
}
