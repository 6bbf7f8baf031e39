package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Warehouse writers — SURVEY.md §2.1 rows S6–S8. */
object Writers {

  /** S7: partitioned parquet write — the warehouse layout. Partition
    * columns become directories, enabling partition pruning on read;
    * at 100 TB choose low-cardinality columns (date, region) so files
    * stay large. */
  def partitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** S8: incremental (high-watermark) append — only rows strictly past
    * the last loaded watermark are appended; the predicate pushes down to
    * the source scan so the incremental pass reads only new data. Returns
    * the new watermark value. */
  def incrementalAppend(
      df: DataFrame,
      watermarkCol: String,
      lastWatermark: Option[Any],
      path: String,
  ): Option[Any] = {
    val fresh = lastWatermark match {
      case Some(wm) => df.filter(col(watermarkCol) > lit(wm))
      case None     => df
    }
    fresh.write.mode(SaveMode.Append).parquet(path)
    fresh.agg(max(col(watermarkCol))).collect().headOption.flatMap(r => Option(r.get(0)))
  }
}
