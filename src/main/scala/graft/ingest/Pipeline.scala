package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.Paths

/** One-call raw-file → warehouse-table pipeline — the reference's core
  * workflow (ingest utilities whose job is "this directory of raw files
  * becomes a queryable warehouse table") as a single library entry point.
  *
  * Steps, each individually exposed for à-la-carte use:
  *  1. read with header/schema inference ([[Readers]] / [[Xlsx]]),
  *  2. sanitize column names to warehouse identifiers ([[Sanitize]]),
  *  3. best-fit type coercion of string columns ([[Coerce.bestFit]]),
  *  4. CREATE TABLE DDL from the coerced schema ([[Ddl.createTable]]),
  *  5. load into the catalog table (append).
  *
  * Scale: steps 1–3 are one inference pass plus one projection; the load
  * is a plain distributed write. Re-running with new files appends —
  * pair with [[Writers.incrementalAppend]] for watermark-driven loads
  * and [[Writers.compact]] for small-file hygiene.
  */
object Pipeline {

  sealed trait Source
  case object Csv extends Source
  case object JsonLines extends Source
  case object Spreadsheet extends Source

  /** Ingest `path` into catalog table `table`; returns the loaded table.
    *
    * @param overwrite drop + recreate the table first (false = append)
    * @param partitionBy warehouse partition columns (sanitized names)
    */
  def loadTable(
      spark: SparkSession,
      path: String,
      table: String,
      source: Source = Csv,
      partitionBy: Seq[String] = Nil,
      overwrite: Boolean = false,
  ): DataFrame = {
    val raw = source match {
      case Csv => Readers.csv(spark, path)
      case JsonLines => Readers.jsonLines(spark, path)
      case Spreadsheet => Xlsx.read(spark, path)
    }
    raw.persist() // inference decision pass + load both read it
    try {
      val typed = Coerce.bestFit(raw)
      val name = Sanitize.sanitizeName(table)
      // readers sanitize column names, so partition columns are
      // addressed by their sanitized form too
      val partCols = partitionBy.map(Sanitize.sanitizeName)
      if (overwrite) {
        spark.sql(s"DROP TABLE IF EXISTS $name")
        // DROP on the in-memory catalog can't clean a location left by a
        // previous JVM's managed table — remove it or CREATE refuses.
        Writers.deleteTree(Paths.get(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name))
      }
      spark.sql(Ddl.createTable(name, typed.schema, partitionCols = partCols))
      val writer = typed.write.mode(SaveMode.Append)
      (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
        .saveAsTable(name)
      spark.table(name)
    } finally raw.unpersist()
  }
}
