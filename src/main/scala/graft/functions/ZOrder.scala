package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit, shiftleft, shiftright, when}

/** The shared Z-ORDER curve builder: maps 2-4 numeric columns to one
  * integer z-value whose range-partitioned order keeps EVERY input
  * column's per-file [min,max] narrow at once — the multi-dimensional
  * file-skipping layout behind [[graft.ingest.Versioned.commitZOrdered]]
  * (s25) and the Delta clustered-table OPTIMIZE
  * ([[graft.interop.DeltaLake.optimizeCluster]], s58).
  *
  * Scale notes: bucket bounds come from one `approxQuantile` pass per
  * column (the driver receives nb-1 doubles per column — no global
  * sort, no single-partition window); the z-value itself is pure
  * integer bit math on codegen'd Column expressions. Quantile
  * bucketing (not min/max-width buckets) keeps the curve balanced
  * under value skew. NULLs rank into the top bucket; a range predicate
  * never selects NULL, so downstream skipping stays sound. */
object ZOrder {

  /** Quantile buckets per dimension: 4 bits x up to 4 dims = a <=16-bit
    * z-value. */
  val Buckets = 16
  private val Bits = 4

  /** The z-value Column for `zCols` over `df`'s distribution. Runs one
    * `approxQuantile` per column NOW (an action on `df`); apply the
    * returned expression to `df` (or any frame with the same columns
    * and a compatible distribution). */
  def zvalue(df: DataFrame, zCols: Seq[String]): Column = {
    require(zCols.size >= 2 && zCols.size <= 4,
      s"ZOrder.zvalue: 2-4 z-order columns (one column wants a plain range sort), got ${zCols.size}")
    val numeric = df.schema.filter(f =>
      f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]).map(_.name).toSet
    require(zCols.forall(numeric.contains),
      s"ZOrder.zvalue: z-order columns must be numeric, got ${zCols.filterNot(numeric).mkString(", ")}")
    val k = zCols.size
    zCols.zipWithIndex.map { case (c, j) =>
      val bounds = df.stat.approxQuantile(
        c, (1 until Buckets).map(_.toDouble / Buckets).toArray, 0.001)
      val bucket = bounds.zipWithIndex.reverse.foldLeft(lit(Buckets - 1)) {
        case (acc, (b, i)) => when(col(c).cast("double") <= b, lit(i)).otherwise(acc)
      }
      (0 until Bits).map(bit =>
        shiftleft(shiftright(bucket, bit).bitwiseAND(lit(1)), bit * k + j))
        .reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }
}
