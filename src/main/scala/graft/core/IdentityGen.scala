package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed IDENTITY value assignment, shared by the Delta
  * `identityColumns` writer feature and the graft-native mirror.
  *
  * Values are CONTIGUOUS and DETERMINISTIC given a deterministic input:
  * row i (in the frame's partition-then-row order) takes
  * `base + step * (i + 1)`. Assignment is the classic two-pass
  * zipWithIndex shape, fully distributed:
  *
  *   1. one job counts rows per partition — only O(partitions) longs
  *      ever reach the driver;
  *   2. the write-side pass computes each row's global position from a
  *      broadcast prefix-sum of those counts plus
  *      `monotonically_increasing_id`'s per-partition counter (low 33
  *      bits; the partition index rides the high bits), all inside
  *      whole-stage codegen — no window, no single-partition shuffle.
  *
  * The extra counting job is the price of gap-free ids (the Delta
  * reference writer stripes values across partitions in one pass
  * instead, trading gaps for the job — both satisfy the protocol,
  * which only demands uniqueness on the `start + k*step` grid). Like
  * `RDD.zipWithIndex`, the two passes assume the input recomputes
  * deterministically; parquet-backed frames (this library's sources)
  * are. At 1000 executors the counts job is a metadata-sized shuffle:
  * one long per partition.
  */
object IdentityGen {

  /** `ceil(a / b)` in exact integer arithmetic, correct for negative
    * `a` and negative `b` (a negative-step identity grid descends). */
  def ceilDiv(a: Long, b: Long): Long =
    Math.floorDiv(a, b) + (if (Math.floorMod(a, b) == 0L) 0L else 1L)

  /** The high watermark after observing value `seen` (an explicit
    * insert or a rival writer's watermark): the nearest grid point
    * `start + k*step` (k >= 0) AT or BEYOND `seen` in step direction,
    * never behind `cur`. Generated values resume one step past it, so
    * they can never collide with anything already observed. */
  def ratchet(start: Long, step: Long, cur: Long, seen: Long): Long = {
    val behind = if (step > 0) seen <= cur else seen >= cur
    if (behind) cur
    else start + step * math.max(0L, ceilDiv(seen - start, step))
  }

  /** Assign `name` over `df` as `base + step*(rowNumber)` (1-based
    * global row number). Returns the frame with the column appended
    * (LongType) and the LAST value assigned — the new high watermark
    * (`base` itself when the frame is empty). */
  def assign(df: DataFrame, name: String, base: Long, step: Long): (DataFrame, Long) = {
    require(step != 0L, "IdentityGen: step must be nonzero")
    val counts = df.groupBy(spark_partition_id().as("__graft_pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val nParts = if (counts.isEmpty) 0 else counts.keys.max + 1
    // prefix-sum offsets: partition p's first row is global position
    // offsets(p); the array is O(partitions) and rides the plan as ONE
    // literal, evaluated by codegen's element_at — no per-row driver work
    val offsets = (0 until nParts).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
    val total = offsets.lastOption.getOrElse(0L)
    if (total == 0L)
      return (df.withColumn(name, lit(null).cast(LongType)), base)
    val mono = monotonically_increasing_id()
    val local = mono.bitwiseAND(lit((1L << 33) - 1))
    val pid = shiftright(mono, 33).cast("int")
    val off = element_at(lit(offsets.dropRight(1).toArray), pid + lit(1))
    val idCol = (lit(base) + lit(step) * (off + local + lit(1L))).cast(LongType)
    (df.withColumn(name, idCol), base + step * total)
  }
}
