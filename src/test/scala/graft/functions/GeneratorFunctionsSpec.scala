package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native n-gram Generator (§2.11 UDTF tier): must match the builtin
  * explode(transform(...)) chain bit-for-bit on real data, and handle the
  * explode-of-NULL edges the same way. */
class GeneratorFunctionsSpec extends AnyFunSuite with SparkFixture {

  test("graft_ngrams equals the builtin explode(transform) chain on the corpus") {
    GeneratorFunctions.register(spark)
    val docs = graft.core.Tables.documents(spark, sf())
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val gen = docs.selectExpr("doc_id", "graft_ngrams(toks, 3) AS g")
    val builtin = docs.filter(size(col("toks")) >= 3).selectExpr("doc_id",
      "explode(transform(sequence(0, size(toks)-3), i -> concat_ws(' ', slice(toks, i+1, 3)))) AS g")
    assert(gen.count() == builtin.count() && gen.count() > 0)
    assert(gen.exceptAll(builtin).isEmpty && builtin.exceptAll(gen).isEmpty,
      "generator and builtin chain disagree on the corpus")
  }

  test("edge semantics: NULL array, NULL/invalid n, and short arrays emit zero rows") {
    GeneratorFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c"), 2),
      (2L, Seq("a"), 2),              // shorter than n
      (3L, Seq.empty[String], 2),
      (4L, Seq("x", "y"), 0),         // invalid n
    ).toDF("id", "toks", "n")
    val out = df.selectExpr("id", "graft_ngrams(toks, n) AS g")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    assert(out == Seq(1L -> "a b", 1L -> "b c"), s"got $out")
    val nulls = spark.sql("SELECT graft_ngrams(CAST(NULL AS ARRAY<STRING>), 2)")
    assert(nulls.count() == 0, "NULL array must explode to zero rows")
    // a NULL token renders as empty, the concat_ws null-dropping rule
    val withNull = Seq((5L, Seq("a", null, "c"))).toDF("id", "toks")
      .selectExpr("graft_ngrams(toks, 2) AS g").as[String].collect().toSeq
    assert(withNull == Seq("a ", " c"), s"got $withNull")
  }

  test("graft_ngrams rejects wrong input types at analysis time") {
    GeneratorFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, "not an array")).toDF("id", "s")
    val e = intercept[Exception](df.selectExpr("graft_ngrams(s, 2)").collect())
    assert(e.getMessage.contains("graft_ngrams") || e.getMessage.contains("DATATYPE"),
      s"expected an analysis-time type error, got: $e")
  }
}
