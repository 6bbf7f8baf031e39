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
