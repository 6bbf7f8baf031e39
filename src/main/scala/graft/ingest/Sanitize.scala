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
    val cleaned = raw.toLowerCase(java.util.Locale.ROOT) // locale-stable: 'I' must not become 'ı' under tr_TR
      .replaceAll("[^a-z0-9]+", "_")
      .replaceAll("^_+|_+$", "")
    val base = if (cleaned.isEmpty) "col" else cleaned
    if (base.head.isDigit) s"c_$base" else base
  }

  /** Sanitize all names, then de-duplicate collisions by suffixing _2, _3…
    * in column order (first occurrence keeps the bare name). Suffixed
    * names are themselves checked against everything emitted OR still to
    * come — ["a", "a", "a_2"] must not produce a second "a_2". */
  def sanitizeNames(raw: Seq[String]): Seq[String] = {
    val bases = raw.map(sanitizeName)
    val taken = scala.collection.mutable.Set.empty[String]
    val pending = scala.collection.mutable.Map.empty[String, Int]
    bases.foreach(b => pending(b) = pending.getOrElse(b, 0) + 1)
    bases.map { base =>
      pending(base) -= 1
      val candidate =
        if (!taken.contains(base)) base
        else {
          var i = 2
          // skip suffixes already emitted AND those a later column will
          // claim as its own sanitized base
          while (taken.contains(s"${base}_$i") || pending.getOrElse(s"${base}_$i", 0) > 0) i += 1
          s"${base}_$i"
        }
      taken += candidate
      candidate
    }
  }

  /** Apply to a DataFrame (rename-only; plan-level, no shuffle). */
  def apply(df: DataFrame): DataFrame =
    df.toDF(sanitizeNames(df.columns.toIndexedSeq): _*)
}
