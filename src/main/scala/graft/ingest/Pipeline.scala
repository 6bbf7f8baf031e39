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
    * @param partitionBy warehouse partition columns (sanitized names; if
    *        the source headers collided during sanitization, address the
    *        deduped name the reader produced, e.g. `load_date_2`)
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
      loadInto(spark, table, typed, partitionBy, overwrite)
    } finally raw.unpersist()
  }

  /** Create-if-needed (or replace) + append `df` into catalog table
    * `table`. The DDL — including its partition-column validation — is
    * generated BEFORE any destructive step, so a bad argument fails
    * without having dropped the existing table. */
  def loadInto(
      spark: SparkSession,
      table: String,
      rawDf: DataFrame,
      partitionBy: Seq[String] = Nil,
      overwrite: Boolean = false,
  ): DataFrame = {
    val name = Sanitize.sanitizeName(table)
    // Sanitize the batch's column names up front (no-op for the
    // Readers/loadTable path, which already did): the DDL, the
    // schema-evolution diff, the ALTER statement, and the by-name append
    // below all assume warehouse-safe identifiers — a raw name like
    // "net amount" would otherwise diff as missing and then break (or
    // double-add) in ALTER TABLE.
    val df = Sanitize(rawDf)
    // readers sanitize column names, so partition columns are addressed
    // by their sanitized form; require them present so a collision-deduped
    // header (load_date_2) can't silently bind to its neighbor
    val partCols = partitionBy.map(Sanitize.sanitizeName)
    val missing = partCols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"partition columns not in the ingested schema: ${missing.mkString(", ")} " +
        s"(have: ${df.columns.mkString(", ")})")
    val ddl = Ddl.createTable(name, df.schema, partitionCols = partCols) // validates before any drop
    if (overwrite) {
      val catalog = spark.sessionState.catalog
      val ident = org.apache.spark.sql.catalyst.TableIdentifier(name)
      // resolve the REAL location from catalog metadata (a warehouse-dir
      // guess is wrong outside the default database and could delete an
      // unrelated table's directory); defaultTablePath covers the
      // leftover-from-a-previous-JVM case DROP can't clean. Only a
      // MANAGED table's directory is deleted: for EXTERNAL tables DROP
      // deliberately preserves the user's data directory, and a library
      // entry point must not destroy data DROP would keep.
      val managedLocation =
        if (catalog.tableExists(ident)) {
          val meta = catalog.getTableMetadata(ident)
          if (meta.tableType == org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED)
            Some(meta.location)
          else {
            // EXTERNAL: never touch the user's data directory — but a
            // stale defaultTablePath left by a crashed prior run would
            // resurface under the recreated MANAGED table, so clean THAT
            // when it is a different directory than the external location.
            // When the external location IS the defaultTablePath, the two
            // rules collide: the files must be preserved (DROP semantics)
            // yet the recreated MANAGED table would silently re-read them
            // alongside the new batch. No correct overwrite exists — fail
            // loudly instead of returning old+new rows.
            val dtp = catalog.defaultTablePath(ident)
            require(Paths.get(dtp.getPath).normalize != Paths.get(meta.location.getPath).normalize,
              s"loadInto(overwrite=true): EXTERNAL table $name is located at its default " +
                s"managed path (${meta.location}); overwriting would re-read the preserved " +
                "files under the recreated managed table. Drop the table (and relocate or " +
                "remove its data) explicitly, or load with overwrite=false.")
            Some(dtp)
          }
        } else Some(catalog.defaultTablePath(ident))
      spark.sql(s"DROP TABLE IF EXISTS $name")
      // full URI, Hadoop-FS delete: the warehouse dir may be HDFS/object
      // storage, where a java.nio path would silently delete nothing
      managedLocation.foreach(loc => Writers.deleteTree(loc.toString))
    }
    spark.sql(ddl)
    // Schema evolution (long-lived ingest pipelines ALWAYS hit drift):
    //  - columns new in this batch → ALTER TABLE ADD COLUMNS (parquet
    //    datasource tables support it natively; old rows read NULL),
    //  - columns the table has but the batch lacks → NULL-filled so the
    //    by-name append aligns.
    // Name-based only: a same-name TYPE change is not silently coerced —
    // the append fails loudly, which is the correct behavior for a
    // warehouse table (a type flip needs a human decision).
    val batchNames = df.columns.map(_.toLowerCase).toSet
    // NULL-fill never applies to the table's PARTITION columns: a batch
    // missing its partition key must fail loudly (as it did before
    // schema evolution existed) — null-filling it would silently land
    // every row in the default partition, invisible to pruned queries.
    // Checked BEFORE the ALTER below (r3 advice): a rejected batch must
    // leave the table schema untouched, not add its new columns first.
    val tablePartCols = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(name))
      .partitionColumnNames
    val missingPartCols = tablePartCols.filterNot(p => batchNames(p.toLowerCase))
    require(missingPartCols.isEmpty,
      s"batch lacks the table's partition column(s): ${missingPartCols.mkString(", ")} " +
        "(refusing to null-fill a partition key)")
    val existingNames = spark.table(name).schema.fieldNames.map(_.toLowerCase).toSet
    val added = df.schema.fields.filterNot(f => existingNames(f.name.toLowerCase))
    if (added.nonEmpty) {
      val colsDdl = added.map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
      spark.sql(s"ALTER TABLE $name ADD COLUMNS ($colsDdl)")
    }
    val aligned = spark.table(name).schema.fields.foldLeft(df) { (acc, f) =>
      if (batchNames(f.name.toLowerCase)) acc
      else acc.withColumn(f.name, org.apache.spark.sql.functions.lit(null).cast(f.dataType))
    }
    val writer = aligned.write.mode(SaveMode.Append)
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .saveAsTable(name)
    spark.table(name)
  }
}
