package graft.ingest

import org.apache.spark.sql.types._

/** Warehouse DDL generation — the reference's schema-to-warehouse step:
  * an inferred DataFrame schema becomes a CREATE TABLE statement with
  * sanitized identifiers and warehouse type names.
  *
  * Pure function of the StructType — unit-testable without a session and
  * trivially correct at any data scale (DDL never touches rows).
  */
object Ddl {

  /** Spark type → ANSI/Hive-compatible DDL type name. */
  def typeName(dt: DataType): String = dt match {
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case StringType => "STRING"
    case BinaryType => "BINARY"
    case DateType => "DATE"
    case _: TimestampNTZType => "TIMESTAMP_NTZ"
    case TimestampType => "TIMESTAMP"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case a: ArrayType => s"ARRAY<${typeName(a.elementType)}>"
    case m: MapType => s"MAP<${typeName(m.keyType)},${typeName(m.valueType)}>"
    case s: StructType =>
      s.fields.map(f => s"${Sanitize.sanitizeName(f.name)}: ${typeName(f.dataType)}")
        .mkString("STRUCT<", ", ", ">")
    case other => other.sql
  }

  /** CREATE TABLE with sanitized column names; optional PARTITIONED BY
    * (partition columns are pulled out of the main column list, Hive
    * layout) and storage format clause. */
  def createTable(
      table: String,
      schema: StructType,
      partitionCols: Seq[String] = Nil,
      format: String = "PARQUET",
      ifNotExists: Boolean = true,
  ): String = {
    val sanitizedPartitions = partitionCols.map(Sanitize.sanitizeName)
    val cols = schema.fields.map(f => Sanitize.sanitizeName(f.name) -> typeName(f.dataType))
    require(cols.map(_._1).distinct.size == cols.size,
      "sanitized column names collide; pre-apply Sanitize.sanitizeNames for suffixing")
    val colType = cols.toMap
    val unknown = sanitizedPartitions.filterNot(colType.contains)
    require(unknown.isEmpty, s"partition columns not in schema: ${unknown.mkString(", ")}")
    val dataCols = cols.filterNot { case (n, _) => sanitizedPartitions.contains(n) }
    val ine = if (ifNotExists) "IF NOT EXISTS " else ""
    val body = dataCols.map { case (n, t) => s"  $n $t" }.mkString(",\n")
    // caller order, not schema order — it defines the directory nesting
    val partClause =
      if (sanitizedPartitions.isEmpty) ""
      else sanitizedPartitions.map(n => s"$n ${colType(n)}").mkString("\nPARTITIONED BY (", ", ", ")")
    s"CREATE TABLE $ine${Sanitize.sanitizeName(table)} (\n$body\n)\nUSING $format$partClause"
  }
}
