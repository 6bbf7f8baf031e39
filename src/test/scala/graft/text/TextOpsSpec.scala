package graft.text

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite with SparkFixture {

  /** Reference implementation of the l4f rolling hash, in plain Scala. */
  private def refFingerprint(text: String): Long =
    text.split(" ").foldLeft(0L) { (h, t) =>
      (h * 131L + t.length.toLong * 31L + t.head.toInt) % 1000000007L
    }

  test("fingerprint matches the plain-Scala reference on literal docs") {
    import spark.implicits._
    val texts = Seq("key agg row", "a", "scan scan scan scan")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = df.select(
      col("doc_id"),
      aggregate(
        split(col("text"), " "),
        lit(0L),
        (h, t) => (h * lit(131L) + length(t).cast("long") * lit(31L) + ascii(substring(t, 1, 1)).cast("long")) % lit(1000000007L),
      ).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((t, i) <- texts.zipWithIndex)
      assert(got(i.toLong) == refFingerprint(t), s"doc $i")
  }

  test("langid confusion matrix covers every actual language") {
    val rows = TextOps.l4dLangId.fn(spark, sf()).collect()
    val actuals = rows.map(_.getString(0)).toSet
    assert(actuals == Set("de", "en", "es", "fr", "zh"))
    val total = rows.map(_.getLong(2)).sum
    assert(total == 500) // every document classified exactly once
  }

  test("quality score stays in a sane range and diversity <= 1") {
    val rows = TextOps.l4eQuality.fn(spark, sf()).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val div = r.getDouble(5)
      assert(div > 0 && div <= 1.0)
    }
  }

  test("bigram LM scores every multi-token doc with probabilities in (0, 1]") {
    import graft.core.Tables
    val rows = TextOps.l4qBigramLm.fn(spark, sf()).collect()
    val multiTok = Tables.documents(spark, sf())
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(rows.length.toLong == multiTok, "every multi-token doc must be scored")
    for (r <- rows) {
      val n = r.getLong(1); val sum = r.getLong(2); val avg = r.getDouble(3)
      assert(n >= 1 && sum >= 1, s"doc ${r.getLong(0)}: degenerate LM sum")
      // each 1e9-scaled P is in (0, 1e9]; so is their average
      assert(avg > 0 && avg <= 1000000000.0, s"doc ${r.getLong(0)}: avg P out of range $avg")
    }
    // a self-trained LM must rate at least one doc above the corpus floor
    assert(rows.map(_.getDouble(3)).max > rows.map(_.getDouble(3)).min,
      "LM collapsed to a constant score — smoothing or counts are broken")
  }
}
