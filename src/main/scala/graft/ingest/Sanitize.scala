package graft.ingest

import org.apache.spark.sql.DataFrame

/** Column-name sanitization — SURVEY.md §2.2 row P3, the reference's core
  * ingestion concern: raw CSV/spreadsheet/JDBC headers become
  * warehouse-safe `[a-z0-9_]` identifiers.
  *
  * Pure Scala (no Spark dependency in the core function) so it is
  * property-testable; applied to a DataFrame via a zero-cost `toDF`
  * rename (metadata-only — no data movement at any scale).
  */
object Sanitize {

  /** Lowercase, collapse every non-alphanumeric run to `_`, trim edge
    * underscores, prefix names that would start with a digit. Empty input
    * maps to "col". */
  def sanitizeName(raw: String): String = {
    val cleaned = raw.toLowerCase
      .replaceAll("[^a-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")
    val base = if (cleaned.isEmpty) "col" else cleaned
    if (base.head.isDigit) s"c_$base" else base
  }

  /** Sanitize all names, then de-duplicate collisions by suffixing _2, _3…
    * in column order (first occurrence keeps the bare name). */
  def sanitizeNames(raw: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    raw.map { r =>
      val base = sanitizeName(r)
      val n = seen.getOrElse(base, 0)
      seen(base) = n + 1
      if (n == 0) base else s"${base}_${n + 1}"
    }
  }

  /** Apply to a DataFrame (rename-only; plan-level, no shuffle). */
  def apply(df: DataFrame): DataFrame =
    df.toDF(sanitizeNames(df.columns.toIndexedSeq): _*)
}
