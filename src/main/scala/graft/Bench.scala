package graft
import org.apache.spark.sql.SparkSession

/** Perf gate: times every SparkEntry query at SPARK_GRAFT_SF_DIR and prints
  * ONE compact JSON line `{"metric":"total","value":…,"queries":{…},…}`.
  *
  * The line is deliberately kept under ~1.5 KB and printed AFTER
  * spark.stop(): round 1's line carried all 93 per-query timings at full
  * double precision (~4 KB) while Spark shutdown threads were still
  * writing to stderr — the driver captures merged/tailed output, and the
  * oversized interleaved line came back `parsed: null` (BENCH_r01.json).
  * Only the slowest queries are itemized; `value` still sums all of them.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, shuffle service, parquet footer caches)
    // so the first timed query doesn't absorb one-time JVM startup cost.
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    var failed = List.empty[String]
    // Name-sorted: hash-map iteration order would shuffle which query pays
    // first-use costs (codegen, state-store init) between rounds, making
    // per-query timings incomparable across BENCH_r{N} files.
    // SPARK_GRAFT_ONLY=a,b,c (dev aid) restricts to the named queries.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // a crashed query must not masquerade as a fast success
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed ::= name
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val total = results.map(_._2).sum
    val slowest = results.sortBy(-_._2).take(20)
    val qs = slowest.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"failed":$failedJson,"queries":$qs,"sf":"$sfDir"}"""
    spark.stop()
    // Printed last, post-stop: no Spark thread can interleave with it.
    println(line)
    System.out.flush()
  }
}
