package graft.core

import graft.SparkFixture
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** chunkedPrefix contract (r3 advice): floor-division chunking must keep
  * the earlier-chunk ⇒ smaller-id invariant for NEGATIVE ids too — a
  * truncating div folds negatives into chunk 0 with the positives and
  * silently corrupts the prefix aggregate. */
class ScaleOpsSpec extends AnyFunSuite with SparkFixture {

  private def runningMax(ids: Seq[Long]): Map[Long, Option[Long]] = {
    import spark.implicits._
    // value = id * 7 % 101: scrambled so the running max is non-monotonic
    val df = ids.map(i => (i, i * 7 % 101)).toDF("id", "v")
    val got = ScaleOps.chunkedPrefix(df, "id", "v", 4L, max, "loc", "pre")
      .withColumn("run_max", greatest(col("loc"), col("pre")))
      .select("id", "run_max")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val want = df
      .withColumn("run_max", max(col("v")).over(
        Window.orderBy(col("id").asc).rowsBetween(Window.unboundedPreceding, -1)))
      .select("id", "run_max")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == want, s"chunked prefix diverges from the single-window reference for ids $ids")
    got
  }

  test("chunkedPrefix matches an unpartitioned running max on positive ids") {
    runningMax(0L to 25L)
  }

  test("chunkedPrefix handles negative ids (floor-division chunking, not truncation)") {
    runningMax(-13L to 12L)
    runningMax(Seq(-9L, -8L, -1L, 0L, 1L, 7L)) // sparse, straddling zero
  }

  test("chunkedPrefix rejects a non-positive chunk size") {
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      ScaleOps.chunkedPrefix(df, "id", "v", 0L, max, "loc", "pre")
    }
  }
}
