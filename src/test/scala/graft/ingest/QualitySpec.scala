package graft.ingest

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualitySpec extends AnyFunSuite with SparkFixture {

  test("report counts violations per rule in one pass; NULL predicates count as violations") {
    import spark.implicits._
    val df = Seq((1L, Some(5.0)), (2L, Some(-1.0)), (3L, None)).toDF("id", "v")
      .select(col("id"), col("v").cast("double"))
    val r = Quality.report(df, Seq(
      "v_non_negative" -> (col("v") >= 0), // NULL for id=3 → violation
      "id_positive" -> (col("id") > 0),
    )).collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r("v_non_negative") == ((3L, 2L, 2.0 / 3)))
    assert(r("id_positive") == ((3L, 0L, 0.0)))
  }

  test("rule names are data: dashes, spaces, quotes all work (no SQL splicing)") {
    import spark.implicits._
    val df = Seq(1L).toDF("id")
    val r = Quality.report(df, Seq(
      "qty-check" -> (col("id") > 0),
      "can't be null" -> col("id").isNotNull,
    )).collect().map(_.getString(0)).sorted
    assert(r.toSeq == Seq("can't be null", "qty-check"))
  }

  test("empty input: zero violations, NULL rate — a gate must check n_rows, not infer health") {
    import spark.implicits._
    val df = Seq.empty[Long].toDF("id")
    val row = Quality.report(df, Seq("id_positive" -> (col("id") > 0))).collect().head
    assert(row.getLong(1) == 0L) // n_rows
    assert(row.getLong(2) == 0L) // n_violations: 0, not NULL
    assert(row.isNullAt(3), "violation_rate must be NULL for an empty load")
  }

  test("duplicate rule names are rejected") {
    import spark.implicits._
    val df = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      Quality.report(df, Seq("r" -> (col("id") > 0), "r" -> col("id").isNotNull))
    }
  }
}
