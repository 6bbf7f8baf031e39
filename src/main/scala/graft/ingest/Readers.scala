package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Ingestion readers — SURVEY.md §2.1 rows S2–S5: the reference's core
  * identity (raw files / RDBMS → warehouse-ready DataFrames with inferred
  * schemas and sanitized column names).
  *
  * Scale notes: schema inference reads a bounded sample (`samplingRatio` /
  * one pass over headers), never the full corpus; a production run infers
  * once, pins the schema, and reads the 100 TB with it (`withSchema`).
  */
object Readers {

  /** S2: CSV with header + schema inference + name sanitization +
    * malformed-row tolerance (PERMISSIVE keeps bad rows as nulls rather
    * than failing the job). */
  def csv(spark: SparkSession, path: String, delimiter: String = ","): DataFrame =
    Sanitize(
      spark.read
        .option("header", "true")
        .option("inferSchema", "true")
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .csv(path))

  /** Same, with a pinned schema — the scale path (no inference pass). */
  def csvWithSchema(spark: SparkSession, path: String, schema: StructType): DataFrame =
    Sanitize(spark.read.option("header", "true").schema(schema).csv(path))

  /** A quarantined CSV load: `good` is the typed, sanitized clean slice;
    * `rejects` carries each malformed input line verbatim (`raw_line`)
    * for triage/replay. Call `release()` once both are consumed — the
    * parsed scan is cached because Spark disallows querying the
    * corrupt-record column straight off a CSV scan (the cache is also
    * what makes good+rejects one parse instead of two). */
  final case class QuarantinedLoad(good: DataFrame, rejects: DataFrame, release: () => Unit)

  /** S2c: CSV read with malformed-row QUARANTINE — an ingest utility must
    * quantify bad input, not silently null it. PERMISSIVE parsing plus an
    * explicit corrupt-record column splits the load into (clean rows,
    * rejected raw lines); the caller lands the rejects next to the table
    * and alerts on the ratio. One parse pass for both sides. */
  def csvWithRejects(
      spark: SparkSession,
      path: String,
      schema: StructType,
  ): QuarantinedLoad = {
    val corrupt = "_graft_corrupt"
    val withCorrupt = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(corrupt, org.apache.spark.sql.types.StringType))
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corrupt)
      .schema(withCorrupt)
      .csv(path)
      .persist() // required: corrupt-record column is only queryable off a materialized plan
    import org.apache.spark.sql.functions.col
    QuarantinedLoad(
      good = Sanitize(raw.filter(col(corrupt).isNull).drop(corrupt)),
      rejects = raw.filter(col(corrupt).isNotNull)
        .select(col(corrupt).as("raw_line")),
      release = () => { raw.unpersist(); () },
    )
  }

  /** S3: JSON-lines with inference. */
  def jsonLines(spark: SparkSession, path: String): DataFrame =
    Sanitize(spark.read.json(path))

  /** S4: JDBC pull, partitioned on a numeric column so the table streams
    * through `numPartitions` parallel connections — the only way a large
    * RDBMS extract scales. Executed live against embedded Derby (see
    * [[Jdbc]] and the `s4_jdbc_pull` entry); against a networked RDBMS
    * only the URL/driver pair changes.
    */
  def jdbcPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      props: Map[String, String] = Map.empty,
  ): DataFrame = {
    val reader = spark.read
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
    props.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  /** Schema-evolved parquet read: merge the (possibly drifted) schemas of
    * every file in the dataset instead of trusting one footer — the read
    * side of append-time schema evolution ([[Writers.incrementalAppend]]
    * happily appends a batch with new columns; files written before the
    * drift then surface the new columns as NULL). mergeSchema costs a
    * footer read per file, so at 100 TB pin the merged schema once and
    * read with `schema(...)` thereafter — same rule as CSV inference. */
  def parquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** S6b: ORC scan — the other columnar warehouse format Spark ships a
    * native vectorized reader for (predicate pushdown + column pruning,
    * same as parquet). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Avro source/sink, via the fully-qualified format class: Spark 4.1
    * bundles `org.apache.spark.sql.avro.AvroFileFormat` inside spark-sql
    * but does not register the short "avro" alias (the connector remains
    * an "external module" by packaging). The FQCN reaches the same
    * reader/writer, so the row-oriented interchange format the reference
    * ecosystem ships (Avro) round-trips end-to-end here — schema
    * embedded per file, splittable container, the standard landing
    * format between Kafka and a warehouse. */
  val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"
  def avro(spark: SparkSession, path: String): DataFrame =
    spark.read.format(AvroFormat).load(path)

  /** S12: XML ingest — Spark 4 ships the XML source natively (rowTag
    * splits records; inference types leaf values). Same sanitize rule as
    * CSV/JSON; same pin-the-schema advice at scale. */
  def xml(spark: SparkSession, path: String, rowTag: String): DataFrame =
    Sanitize(spark.read.option("rowTag", rowTag).format("xml").load(path))

  // S5 (spreadsheets) has a self-contained reader in graft.ingest.Xlsx
  // (zip+XML over Spark binaryFile — parallel across workbooks).
}
