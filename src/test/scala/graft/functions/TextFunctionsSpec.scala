package graft.functions

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextFunctionsSpec extends AnyFunSuite with SparkFixture {

  test("graft_nfc composes decomposed sequences to their NFC form") {
    TextFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(
      "e\u0301",       // e + COMBINING ACUTE -> \u00e9
      "A\u030a",       // A + COMBINING RING  -> \u00c5
      "d\u0307\u0323", // d + dot-above + dot-below: NFC must reorder then compose
    ).toDF("s").selectExpr("graft_nfc(s) AS n").as[String].collect()
    assert(rows(0) == "\u00e9")
    assert(rows(1) == "\u00c5")
    assert(rows(2) == java.text.Normalizer.normalize("d\u0307\u0323", java.text.Normalizer.Form.NFC))
  }

  test("ASCII input is returned unchanged (fast path) and NULL yields NULL") {
    TextFunctions.register(spark)
    import spark.implicits._
    val ascii = Seq("plain ascii text 123").toDF("s")
      .selectExpr("graft_nfc(s) AS n").as[String].collect().head
    assert(ascii == "plain ascii text 123")
    val row = spark.sql("SELECT graft_nfc(CAST(NULL AS STRING))").collect().head
    assert(row.isNullAt(0))
  }

  test("interpreted and codegen paths agree on every corpus document") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    TextFunctions.register(spark)
    val denorm = graft.core.Tables.documents(spark, sf())
      .filter(col("text").isNotNull)
      .withColumn("raw", regexp_replace(col("text"), "e", "e\u0301"))
    // codegen path: normal DataFrame execution (whole-stage codegen on)
    val viaCodegen = denorm.selectExpr("doc_id", "graft_nfc(raw) AS n")
    // interpreted path: the EXPRESSION's eval() per row \u2014 exercises the
    // real nullSafeEval cast chain, not the shared static helper directly
    val viaInterp = denorm.select(col("doc_id"), col("raw")).collect().map { r =>
      r.getLong(0) -> NfcNormalize(Literal(r.getString(1))).eval(null)
        .asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    }.toMap
    viaCodegen.collect().foreach { r =>
      assert(r.getString(1) == viaInterp(r.getLong(0)),
        s"codegen/interpreted divergence at doc ${r.getLong(0)}")
    }
    // interpreted null handling too (the codegen null path is covered by
    // the SQL NULL test below)
    assert(NfcNormalize(Literal(null, StringType)).eval(null) == null)
  }

  test("graft_nfc is idempotent over the denormalized corpus") {
    TextFunctions.register(spark)
    val diverged = graft.core.Tables.documents(spark, sf())
      .filter(col("text").isNotNull)
      .withColumn("raw", regexp_replace(col("text"), "e", "e\u0301"))
      .selectExpr("graft_nfc(raw) AS once")
      .selectExpr("once", "graft_nfc(once) AS twice")
      .filter(col("once") =!= col("twice"))
      .count()
    assert(diverged == 0, s"NFC not a fixpoint on $diverged documents")
  }

  test("graft_nfc rejects non-string input at analysis time") {
    TextFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_nfc(42)").collect()
    }
    assert(e.getMessage.contains("graft_nfc") || e.getMessage.toLowerCase.contains("type"))
  }
}
