package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite with SparkFixture {

  test("DotProduct equals the builtin aggregate/zip_with fold bit-for-bit") {
    VectorFunctions.register(spark)
    val emb = graft.core.Tables.embeddings(spark, sf()).limit(50)
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .limit(500)
    val builtin = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val diff = pairs.select((expr("graft_dot(a, b)") - builtin).as("d")).agg(max(abs(col("d")))).collect().head.getDouble(0)
    assert(diff == 0.0, s"native and builtin folds diverge by $diff")
  }

  test("graft_dot registers as a SQL function") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val row = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
      .selectExpr("graft_dot(a, b) AS d")
      .collect().head
    assert(row.getDouble(0) == 32.0)
  }

  test("null arrays yield null, not a crash") {
    VectorFunctions.register(spark)
    val row = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))").collect().head
    assert(row.isNullAt(0))
  }

  test("length mismatch and null elements yield null, matching the builtin fold") {
    VectorFunctions.register(spark)
    val rows = spark.sql("""
      SELECT
        graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS len_mismatch,
        graft_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS null_elem
    """).collect().head
    assert(rows.isNullAt(0), "mismatched lengths must not produce a partial dot product")
    assert(rows.isNullAt(1), "a null element must poison the sum")
  }
}
