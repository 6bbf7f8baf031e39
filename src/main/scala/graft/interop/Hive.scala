package graft.interop

/** The Hive partition-path escape convention shared by the interop
  * writers/readers (what Spark's own partitioned writes produce and
  * `ExternalCatalogUtils` decodes): control chars and the reserved set
  * percent-encode as %XX; a null partition value renders as the
  * `__HIVE_DEFAULT_PARTITION__` sentinel. */
private[interop] object Hive {

  val DefaultPartition = "__HIVE_DEFAULT_PARTITION__"

  private val escapeChars: Set[Char] =
    (Seq('\b', '\t', '\n', '\f', '\r', '"', '#', '%', '\'', '*', '/', ':',
      '=', '?', '\\', '{', '[', ']', '^') ++ (0 until 32).map(_.toChar)).toSet

  def escapePathName(s: String): String = {
    val b = new StringBuilder
    s.foreach { c =>
      if (escapeChars.contains(c)) b.append(f"%%${c.toInt}%02X") else b.append(c)
    }
    b.toString
  }

  /** A manifest-origin file location (`file_path` in an Iceberg avro
    * manifest, a manifest-list / metadata path) → the on-disk
    * filesystem path, WITHOUT any percent-decoding. Manifest strings
    * are raw location bytes: a Hive-escaped partition dir puts literal
    * `%3A` (and raw spaces) in the path, so `java.net.URI` would either
    * reject the string (space → URISyntaxException) or corrupt it
    * (decode the literal escape). Hadoop `Path` strips a scheme and
    * authority while round-tripping every byte. Spark METADATA strings
    * (`_metadata.file_path`, `input_file_name()`) are the opposite —
    * genuine URL-encoded URIs that MUST go through `java.net.URI` — so
    * pick by provenance, not by convenience. */
  def fsPathNoDecode(raw: String): String =
    new org.apache.hadoop.fs.Path(raw).toUri.getPath

  def unescapePathName(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val code =
          try Integer.parseInt(s.substring(i + 1, i + 3), 16)
          catch { case _: NumberFormatException => -1 }
        if (code >= 0) { b.append(code.toChar); i += 3 }
        else { b.append(c); i += 1 }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }
}

/** Shared staging-dir walker for the interop writers: the parquet
  * files Spark staged, as (partition-relative path, absolute path,
  * size). */
private[interop] object Staging {
  import org.apache.hadoop.fs.{FileSystem, Path => HPath}
  def walk(fs: FileSystem, dir: HPath, rel: String = ""): Seq[(String, HPath, Long)] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (st.isDirectory) walk(fs, st.getPath, if (rel.isEmpty) name else s"$rel/$name")
      else if (name.endsWith(".parquet"))
        Seq((if (rel.isEmpty) name else s"$rel/$name", st.getPath, st.getLen))
      else Nil
    }
}

/** Canonical timestamp rendering for the interop formats' per-file
  * statistics: the pruning compare
  * ([[graft.ingest.Versioned.statsMayOverlap]] /
  * `VersionedFileIndex.statDomain`) works on `yyyy-MM-dd HH:mm:ss`
  * strings in the SESSION time zone, byte-wise — an ISO `T` separator,
  * fractional seconds, or a fixed-UTC rendering under a non-UTC
  * session all compare wrongly and can prune files that hold matching
  * rows. Bounds widen, never narrow: minimums floor to the second,
  * maximums ceil. */
private[interop] object StatsTime {

  private val Fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  def render(instant: java.time.Instant, zone: java.time.ZoneId, ceil: Boolean): String = {
    val adjusted =
      if (ceil && instant.getNano > 0)
        instant.truncatedTo(java.time.temporal.ChronoUnit.SECONDS).plusSeconds(1)
      else instant.truncatedTo(java.time.temporal.ChronoUnit.SECONDS)
    java.time.LocalDateTime.ofInstant(adjusted, zone).format(Fmt)
  }

  /** Spec-shaped stats rendering for the DELTA LOG: zone-independent
    * UTC ISO-8601 with `Z` — the shape foreign Delta readers parse and
    * [[canonicalize]] maps into the session compare domain at read
    * time. Writing a session-zone rendering instead would corrupt the
    * round trip whenever the session zone is not UTC (the reader must
    * treat zone-less/`Z` stats as UTC instants, per the protocol). */
  def renderUtcIso(instant: java.time.Instant, ceil: Boolean): String = {
    val adjusted =
      if (ceil && instant.getNano > 0)
        instant.truncatedTo(java.time.temporal.ChronoUnit.SECONDS).plusSeconds(1)
      else instant.truncatedTo(java.time.temporal.ChronoUnit.SECONDS)
    java.time.format.DateTimeFormatter.ISO_INSTANT.format(adjusted)
  }

  private val IsoLike =
    """(\d{4}-\d{2}-\d{2})[T ](\d{2}:\d{2}:\d{2})(\.\d+)?(Z|[+-]\d{2}:?\d{2})?""".r

  /** Canonicalize a FOREIGN stats string when it looks like an ISO
    * timestamp (Delta writes `2024-01-15T08:00:00.123Z` shapes);
    * anything else passes through untouched. Zone-less values are the
    * spec's UTC-stored instants. */
  def canonicalize(raw: String, zone: java.time.ZoneId, ceil: Boolean): String = raw match {
    case IsoLike(date, time, frac, zoneSuffix) =>
      val nanos = Option(frac).map(f => (f.drop(1).padTo(9, '0').take(9)).toLong).getOrElse(0L)
      val ldt = java.time.LocalDateTime.parse(s"${date}T$time").plusNanos(nanos)
      val instant = Option(zoneSuffix).filter(_ != "Z") match {
        case Some(off) =>
          ldt.atOffset(java.time.ZoneOffset.of(off)).toInstant
        case None => ldt.toInstant(java.time.ZoneOffset.UTC)
      }
      render(instant, zone, ceil)
    case _ => raw
  }
}
