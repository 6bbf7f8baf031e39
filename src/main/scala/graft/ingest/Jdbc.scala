package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Embedded-Derby JDBC support — SURVEY.md §2.1 row S4, executed LIVE.
  *
  * The environment has no external database, but Derby 10.16 ships on the
  * Spark classpath, and its embedded engine is a real transactional RDBMS
  * running inside this JVM — so the full S4 path (load a warehouse dim
  * into an RDBMS, pull it back through Spark's partitioned JDBC source)
  * runs end-to-end and is oracled like any other entry. Against a
  * networked database the only change is the URL + driver pair;
  * [[Readers.jdbcPartitioned]] is identical either way.
  */
object Jdbc {

  /** Derby's embedded driver lives in derbytools.jar (10.15+ split). */
  val DerbyEmbeddedDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** Route Derby's engine log into a scratch dir instead of the process
    * CWD. Read once at engine boot, so the first caller wins JVM-wide —
    * acceptable: every caller passes a scratch path. */
  private def routeDerbyLog(dir: String): Unit =
    if (System.getProperty("derby.stream.error.file") == null) {
      System.setProperty(
        "derby.stream.error.file",
        java.nio.file.Paths.get(dir, "derby.log").toString)
    }

  /** Embedded-Derby URL for a database stored under `dir` (created on
    * first connect). */
  def derbyUrl(dir: String): String = {
    routeDerbyLog(dir)
    s"jdbc:derby:$dir/db;create=true"
  }

  /** Load `df` into JDBC table `table` (drop + recreate — Spark's
    * Overwrite against JDBC). Single-threaded per partition on the DB
    * side; for a big fact this is where a real deployment sizes
    * `numPartitions` on the WRITE to match the DB's ingest parallelism. */
  def load(df: DataFrame, url: String, table: String, driver: String = DerbyEmbeddedDriver): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("jdbc")
      .option("url", url)
      .option("driver", driver)
      .option("dbtable", table)
      .save()
}
